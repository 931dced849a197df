#!/usr/bin/env python3
"""Randomized VP8 conformance checker: decode every `<name>.webp` in
the directory given as argv[1] with the canonical C decoder (libwebp's
simple API via ctypes) and byte-compare against the encoder's own
predicted reconstruction `<name>.pred.yuv` (visible region, Y plane
row-major then U then V at half resolution — Vp8GoldenGen's layout).
When a sibling `<name>.alpha` exists (extended VP8X+ALPH containers),
ALSO decode RGBA and byte-compare the alpha plane — the ALPH chunk is
uncompressed, so conformance means byte-identity.

Unlike tools/vp8_libwebp_dump.py (which refreshes the four committed
golden fixtures), this is the verdict-driven RANDOMIZED sweep's
decoder half: Vp8ConformanceSpec generates seeded-random images across
sizes and qindex extremes, encodes them, writes webp+pred pairs to a
temp directory, and shells out here. Exit codes: 0 = every file
matches; 1 = divergence (details on stdout); 42 = libwebp unavailable
on this box (the spec skips loudly instead of failing)."""
import ctypes
import pathlib
import sys

try:
    lib = ctypes.CDLL("libwebp.so.7")
except OSError:
    sys.exit(42)

lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
lib.WebPDecodeYUV.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
lib.WebPDecodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
lib.WebPFree.argtypes = [ctypes.c_void_p]


def decode_yuv(data):
    w, h = ctypes.c_int(), ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_ubyte)()
    v = ctypes.POINTER(ctypes.c_ubyte)()
    stride, uv_stride = ctypes.c_int(), ctypes.c_int()
    y = lib.WebPDecodeYUV(data, len(data), ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(u), ctypes.byref(v),
                          ctypes.byref(stride), ctypes.byref(uv_stride))
    if not y:
        return None
    W, H, S, US = w.value, h.value, stride.value, uv_stride.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    yb = ctypes.cast(y, ctypes.POINTER(ctypes.c_ubyte * (S * H))).contents
    ub = ctypes.cast(u, ctypes.POINTER(ctypes.c_ubyte * (US * ch))).contents
    vb = ctypes.cast(v, ctypes.POINTER(ctypes.c_ubyte * (US * ch))).contents
    out = bytes(yb[j * S + i] for j in range(H) for i in range(W)) + \
        bytes(ub[j * US + i] for j in range(ch) for i in range(cw)) + \
        bytes(vb[j * US + i] for j in range(ch) for i in range(cw))
    lib.WebPFree(ctypes.cast(y, ctypes.c_void_p))
    return (W, H, out)


def decode_alpha(data, n):
    w, h = ctypes.c_int(), ctypes.c_int()
    rgba = lib.WebPDecodeRGBA(data, len(data),
                              ctypes.byref(w), ctypes.byref(h))
    if not rgba:
        return None
    buf = ctypes.cast(
        rgba, ctypes.POINTER(ctypes.c_ubyte * (w.value * h.value * 4)))
    out = bytes(buf.contents[4 * i + 3] for i in range(n))
    lib.WebPFree(ctypes.cast(rgba, ctypes.c_void_p))
    return out


def main():
    d = pathlib.Path(sys.argv[1])
    fixtures = sorted(d.glob("*.webp"))
    if not fixtures:
        print(f"no .webp files in {d}")
        return 1
    bad = 0
    for p in fixtures:
        data = p.read_bytes()
        pred = (p.parent / (p.stem + ".pred.yuv")).read_bytes()
        got = decode_yuv(data)
        if got is None:
            print(f"FAIL {p.name}: libwebp refused to decode")
            bad += 1
            continue
        w, h, yuv = got
        if yuv != pred:
            diff = next(i for i in range(min(len(yuv), len(pred)))
                        if yuv[i] != pred[i]) \
                if yuv[:len(pred)] != pred else "length"
            print(f"FAIL {p.name}: {w}x{h} yuv diverges at byte {diff} "
                  f"(got {len(yuv)} bytes, predicted {len(pred)})")
            bad += 1
            continue
        ap = p.parent / (p.stem + ".alpha")
        if ap.exists():
            want = ap.read_bytes()
            got_a = decode_alpha(data, len(want))
            if got_a != want:
                print(f"FAIL {p.name}: alpha plane diverges")
                bad += 1
                continue
        print(f"PASS {p.name} ({w}x{h}"
              f"{', alpha' if ap.exists() else ''})")
    print(f"== {len(fixtures) - bad} pass, {bad} fail ==")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
