#!/usr/bin/env python3
"""Rate-distortion comparison of graft's VP8 encoder vs the system
libwebp encoder, on the committed golden fixtures (r19 verdict task 6:
'add a bytes-per-pixel + PSNR comparison vs the system encoder ...
before deciding whether B_PRED/loop-filter work is worth it').

Protocol (symmetric, decoder-referenced):
  - the fixture SOURCES are reproduced here from Vp8GoldenGen's
    deterministic generators (same formulas, same pixels);
  - BOTH encoders' outputs are decoded by the same canonical decoder
    (libwebp WebPDecodeRGBA) and scored as RGB PSNR against the source
    (so neither side is judged by its own colorspace conversion);
  - ours is the committed `.webp` at the fixture's qindex; libwebp is
    swept over quality 0..100 to find the smallest file whose PSNR
    MEETS OR EXCEEDS ours ('matched PSNR'), plus the size at its
    closest-PSNR setting.

Prints a table and the size ratio at matched PSNR. Pure measurement —
exits 0 always (unless libwebp is absent: exit 42)."""
import ctypes
import math
import pathlib
import sys

try:
    lib = ctypes.CDLL("libwebp.so.7")
except OSError:
    sys.exit(42)

lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
lib.WebPDecodeRGBA.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                               ctypes.POINTER(ctypes.c_int),
                               ctypes.POINTER(ctypes.c_int)]
lib.WebPEncodeRGB.restype = ctypes.c_size_t
lib.WebPEncodeRGB.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                              ctypes.c_int, ctypes.c_float,
                              ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]
lib.WebPFree.argtypes = [ctypes.c_void_p]


# Vp8GoldenGen.fixtures, reproduced (name, w, h, qindex, pixel(x, y))
def noise(x, y):
    s = (x * 2654435761 + y * 40503 + 12345) & 0xffffffff
    return ((s % 255) << 16) | (((s >> 8) % 255) << 8) | ((s >> 16) % 255)


FIXTURES = [
    ("vp8_gradient_64x48_q40", 64, 48, 40,
     lambda x, y: ((x * 4 & 0xff) << 16) | ((y * 5 & 0xff) << 8) |
     ((x + y) * 2 & 0xff)),
    ("vp8_checker_80x80_q20", 80, 80, 20,
     lambda x, y: 0xd02020 if ((x // 8) + (y // 8)) % 2 == 0 else 0x2040c0),
    ("vp8_noise_33x17_q75", 33, 17, 75, noise),
    ("vp8_flat_128x96_q90", 128, 96, 90, lambda x, y: 0x808080),
]


def decode_rgb(data):
    w, h = ctypes.c_int(), ctypes.c_int()
    p = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    assert p, "decode failed"
    n = w.value * h.value
    buf = ctypes.cast(p, ctypes.POINTER(ctypes.c_ubyte * (n * 4))).contents
    out = bytes(buf)
    lib.WebPFree(ctypes.cast(p, ctypes.c_void_p))
    return out  # RGBA


def psnr_rgb(src_rgb, rgba):
    n = len(src_rgb) // 3
    se = 0
    for i in range(n):
        for c in range(3):
            d = src_rgb[3 * i + c] - rgba[4 * i + c]
            se += d * d
    if se == 0:
        return float("inf")
    return 10 * math.log10((255.0 ** 2) * 3 * n / se)


def libwebp_encode(rgb, w, h, q):
    out = ctypes.POINTER(ctypes.c_ubyte)()
    size = lib.WebPEncodeRGB(bytes(rgb), w, h, w * 3, float(q),
                             ctypes.byref(out))
    assert size > 0, "libwebp encode failed"
    buf = ctypes.cast(out, ctypes.POINTER(ctypes.c_ubyte * size)).contents
    data = bytes(buf)
    lib.WebPFree(ctypes.cast(out, ctypes.c_void_p))
    return data


def main():
    root = pathlib.Path(__file__).resolve().parent.parent
    gold = root / "src/test/resources/golden/vp8"
    print(f"{'fixture':28} {'ours bpp':>9} {'ours PSNR':>10} "
          f"{'lw bpp@matched':>14} {'lw PSNR':>8} {'size ratio':>10}")
    ratios = []
    for name, w, h, qindex, px in FIXTURES:
        src_rgb = bytearray()
        for y in range(h):
            for x in range(w):
                p = px(x, y)
                src_rgb += bytes(((p >> 16) & 0xff, (p >> 8) & 0xff,
                                  p & 0xff))
        ours = (gold / f"{name}.webp").read_bytes()
        ours_psnr = psnr_rgb(src_rgb, decode_rgb(ours))
        ours_bpp = 8.0 * len(ours) / (w * h)
        # sweep libwebp for the smallest file meeting our PSNR
        best = None
        for q in range(0, 101, 2):
            data = libwebp_encode(src_rgb, w, h, q)
            p = psnr_rgb(src_rgb, decode_rgb(data))
            if p >= ours_psnr or q == 100:
                best = (q, len(data), p)
                break
        q, size, p = best
        lw_bpp = 8.0 * size / (w * h)
        ratio = len(ours) / size
        # a q=100 fallback that still did NOT reach our PSNR is not a
        # matched comparison — flag it and keep it OUT of the headline
        # geomean rather than silently blending an unmatched ratio in
        matched = p >= ours_psnr
        if matched:
            ratios.append(ratio)
        print(f"{name:28} {ours_bpp:9.3f} {ours_psnr:10.2f} "
              f"{lw_bpp:14.3f} {p:8.2f} {ratio:10.2f}x  (lw q={q}"
              f"{'' if matched else ' UNMATCHED: libwebp PSNR below ours even at q=100 — excluded from geomean'})")
    if not ratios:
        print("\nno fixture reached a matched-PSNR comparison")
        return 0
    gm = math.exp(sum(math.log(r) for r in ratios) / len(ratios))
    print(f"\ngeometric-mean size ratio at matched-or-better libwebp "
          f"PSNR: {gm:.2f}x over {len(ratios)}/{len(FIXTURES)} "
          "matched fixtures")
    print("(>2x at matched PSNR was the verdict's bar for investing in "
          "B_PRED/loop-filter)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
