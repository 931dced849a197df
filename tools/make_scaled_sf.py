#!/usr/bin/env python3
"""Synthesize an R-times-scaled copy of a testdata SF directory for
time-vs-scale SLOPE measurement (driver-side tooling, like check.py —
the engine itself never reads these).

The point is to grow the INPUT while preserving each query family's
workload character, so a measured slope reflects the operator, not a
synthetic artifact:

- documents: R replicas, doc_id += i*ID_STEP. Replica i>0 re-labels
  every purely-alphabetic non-anchor token through a deterministic
  SHIFT of the corpus vocabulary (injective, so within-replica
  near-dup/jaccard structure is preserved EXACTLY while cross-replica
  same-doc jaccard collapses to the shared anchor tokens — replicas
  are new content, not 3x exact duplicates, which would explode dedup
  pair counts quadratically and measure an artifact). Anchor tokens =
  the engine's langid + Gopher stopword sets (TextAnalysis.scala), so
  stopword-gated filter selectivity (q4/q6 minStopHits, t-rules) is
  unchanged; everything non-[a-z]+ (punctuated, capitalized, numeric)
  passes through untouched.
- embeddings: R replicas, vec_id += i*ID_STEP, replica i ROTATES each
  vector by i*17 positions (norm- and within-replica-cosine-preserving;
  cross-replica cosines land at chance level). label kept.
- lineitem / orders: R replicas with key offsets (l_orderkey /
  o_orderkey / o_custkey consistent so join fan-outs are preserved);
  measure columns untouched (column-stat distributions identical).
- events + dimension tables (region nation customer supplier part):
  copied as-is (none of the slope queries read them; dims are
  broadcast sides whose size must NOT grow with sf anyway).

Usage: python3 tools/make_scaled_sf.py <src_sf_dir> <out_dir> <R>
"""
import re
import sys, shutil, pathlib
import duckdb

STOPWORDS = {
    # TextAnalysis.stopwords (en/de/es/fr) + gopherStopwords
    "the", "and", "of", "to", "a", "in", "is", "it", "you", "that",
    "was", "for", "on", "are", "with", "his", "they", "at",
    "der", "die", "das", "und", "ist", "ich", "nicht", "ein", "eine",
    "mit", "auf", "für", "von", "zu", "den", "im",
    "el", "la", "de", "que", "y", "en", "un", "una", "los", "las",
    "por", "con", "para", "es", "del", "se",
    "le", "les", "et", "une", "des", "est", "dans", "pour", "qui",
    "sur", "avec", "pas",
    "be", "have",
}
ID_STEP = 100_000_000


def scale_documents(con, src, out, r):
    rows = con.execute(
        f"SELECT doc_id, text, lang, source FROM '{src}/documents.parquet'"
    ).fetchall()
    vocab = sorted({t for (_, text, _, _) in rows if text
                    for t in text.split()
                    if t.isalpha() and t.islower() and t not in STOPWORDS})
    idx = {w: j for j, w in enumerate(vocab)}
    v = len(vocab)
    # shift step: a fixed odd stride so replica maps are derangements
    # (v never divides i*stride for the i we use unless v is tiny)
    stride = (v // 7) * 2 + 1

    def relabel(text, i):
        if text is None or i == 0:
            return text
        shift = (i * stride) % v
        # whitespace-PRESERVING split (capturing group keeps the
        # separators): newlines/tabs/run-lengths survive relabeling, so
        # line-gated signals (Gopher dup-line fractions, n_chars
        # bounds) see the same structure in every replica
        return "".join(
            vocab[(idx[t] + shift) % v]
            if (t.isalpha() and t.islower() and t not in STOPWORDS
                and t in idx)
            else t
            for t in re.split(r"(\s+)", text))

    con.execute("CREATE OR REPLACE TABLE docs_out(doc_id BIGINT, "
                "text VARCHAR, lang VARCHAR, source VARCHAR, "
                "n_chars BIGINT)")
    # one replica at a time: bounds Python-side memory to one corpus
    # copy regardless of R (larger source SFs stay feasible)
    for i in range(r):
        rep = [(doc_id + i * ID_STEP, nt, lang, source,
                len(nt) if nt is not None else None)
               for (doc_id, text, lang, source) in rows
               for nt in (relabel(text, i),)]
        con.executemany("INSERT INTO docs_out VALUES (?,?,?,?,?)", rep)
    con.execute(f"COPY (SELECT * FROM docs_out ORDER BY doc_id) TO "
                f"'{out}/documents.parquet' (FORMAT PARQUET)")


def scale_embeddings(con, src, out, r):
    dim = con.execute(
        f"SELECT len(embedding) FROM '{src}/embeddings.parquet' LIMIT 1"
    ).fetchone()[0]
    parts = []
    for i in range(r):
        k = (i * 17) % dim
        rot = ("embedding" if k == 0 else
               f"list_concat(embedding[{k + 1}:], embedding[1:{k}])")
        parts.append(
            f"SELECT vec_id + {i * ID_STEP} AS vec_id, "
            f"CAST({rot} AS FLOAT[]) AS embedding, label "
            f"FROM '{src}/embeddings.parquet'")
    con.execute(f"COPY ({' UNION ALL '.join(parts)} ORDER BY vec_id) TO "
                f"'{out}/embeddings.parquet' (FORMAT PARQUET)")


def scale_facts(con, src, out, r):
    li = " UNION ALL ".join(
        f"SELECT l_orderkey + {i * ID_STEP} AS l_orderkey, l_partkey, "
        f"l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
        f"l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate "
        f"FROM '{src}/lineitem.parquet'" for i in range(r))
    con.execute(f"COPY ({li}) TO '{out}/lineitem.parquet' "
                "(FORMAT PARQUET)")
    od = " UNION ALL ".join(
        f"SELECT o_orderkey + {i * ID_STEP} AS o_orderkey, o_custkey, "
        f"o_orderstatus, o_totalprice, o_orderdate, o_orderpriority "
        f"FROM '{src}/orders.parquet'" for i in range(r))
    con.execute(f"COPY ({od}) TO '{out}/orders.parquet' "
                "(FORMAT PARQUET)")


def main():
    src, out, r = sys.argv[1], sys.argv[2], int(sys.argv[3])
    pathlib.Path(out).mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    scale_documents(con, src, out, r)
    scale_embeddings(con, src, out, r)
    scale_facts(con, src, out, r)
    for t in ["region", "nation", "customer", "supplier", "part",
              "events"]:
        shutil.copy(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
    for t in ["documents", "embeddings", "lineitem", "orders"]:
        n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'"
                        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
