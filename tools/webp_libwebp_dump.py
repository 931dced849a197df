#!/usr/bin/env python3
"""Decode the committed WebP golden fixtures with the canonical C decoder
(libwebp's WebPDecodeRGBA via ctypes) and dump the raw RGBA pixels next to
them. GoldenWebpSpec asserts the repo's pure-JVM decoder reproduces these
dumps byte-for-byte — making the codec's libwebp-conformance claim
checkable from the committed tree.

Run after graft.images.GoldenGen whenever the encoder's bitstream layout
changes on purpose:  python3 tools/webp_libwebp_dump.py
"""
import ctypes
import pathlib

lib = ctypes.CDLL("libwebp.so.7")
lib.WebPGetInfo.restype = ctypes.c_int
lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
lib.WebPFree.argtypes = [ctypes.c_void_p]

root = pathlib.Path(__file__).resolve().parent.parent
fixtures = sorted((root / "src/test/resources/golden/webp").glob("*.webp"))
assert fixtures, "no .webp fixtures found - run graft.images.GoldenGen first"
for p in fixtures:
    data = p.read_bytes()
    w, h = ctypes.c_int(), ctypes.c_int()
    assert lib.WebPGetInfo(data, len(data), ctypes.byref(w), ctypes.byref(h)), \
        f"{p.name}: libwebp rejected the container/header"
    ptr = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    assert ptr, f"{p.name}: libwebp failed to decode"
    n = w.value * h.value * 4
    rgba = bytes(ctypes.cast(ptr, ctypes.POINTER(ctypes.c_ubyte * n)).contents)
    lib.WebPFree(ctypes.cast(ptr, ctypes.c_void_p))
    out = p.with_suffix(".rgba")
    out.write_bytes(rgba)
    print(f"{p.name}: {w.value}x{h.value} -> {out.name} ({n} bytes)")
