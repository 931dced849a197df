#!/usr/bin/env python3
"""Decode the committed LOSSY (VP8) golden fixtures with the canonical
C decoder (libwebp's WebPDecodeYUV via ctypes) and dump the raw YUV420
planes next to them as `<name>.libwebp.yuv` (Y plane row-major, then U,
then V at half resolution — the same layout Vp8GoldenGen writes for the
encoder's own predicted reconstruction). Vp8GoldenSpec asserts the two
are byte-identical, making the VP8 entropy/bitstream layer's
libwebp-conformance claim checkable from the committed tree.

Run after `sbt "Test/runMain graft.images.Vp8GoldenGen"` whenever the
encoder's bitstream layout changes on purpose:
    python3 tools/vp8_libwebp_dump.py
"""
import ctypes
import pathlib

lib = ctypes.CDLL("libwebp.so.7")
lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
lib.WebPDecodeYUV.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
lib.WebPFree.argtypes = [ctypes.c_void_p]

root = pathlib.Path(__file__).resolve().parent.parent
fixtures = sorted((root / "src/test/resources/golden/vp8").glob("*.webp"))
assert fixtures, "no .webp fixtures - run graft.images.Vp8GoldenGen first"
for p in fixtures:
    data = p.read_bytes()
    w, h = ctypes.c_int(), ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_ubyte)()
    v = ctypes.POINTER(ctypes.c_ubyte)()
    stride, uv_stride = ctypes.c_int(), ctypes.c_int()
    y = lib.WebPDecodeYUV(data, len(data), ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(u), ctypes.byref(v),
                          ctypes.byref(stride), ctypes.byref(uv_stride))
    assert y, f"{p.name}: libwebp failed to decode"
    W, H, S, US = w.value, h.value, stride.value, uv_stride.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    yb = ctypes.cast(y, ctypes.POINTER(ctypes.c_ubyte * (S * H))).contents
    ub = ctypes.cast(u, ctypes.POINTER(ctypes.c_ubyte * (US * ch))).contents
    vb = ctypes.cast(v, ctypes.POINTER(ctypes.c_ubyte * (US * ch))).contents
    out = bytes(yb[j * S + i] for j in range(H) for i in range(W)) + \
        bytes(ub[j * US + i] for j in range(ch) for i in range(cw)) + \
        bytes(vb[j * US + i] for j in range(ch) for i in range(cw))
    lib.WebPFree(ctypes.cast(y, ctypes.c_void_p))
    outp = p.parent / (p.stem + ".libwebp.yuv")
    outp.write_bytes(out)
    print(f"{p.name}: {W}x{H} -> {outp.name} ({len(out)} bytes)")
