#!/usr/bin/env python3
"""One-off scale-ladder fixture generator (round-6 verdict item #7).

Synthesizes documents/part tables with the SAME statistical shape as the
driver's sf0.1 fixtures (31-word vocab, 10..100-token docs, 5 langs,
20 sources, ~0.2% exact dups; 25 brands, 2-word part names) at 1x / 3x /
10x the sf0.1 row counts, so the three heaviest pairwise operators
(q43 n-gram Jaccard, q84 dup clusters, q86 edit-distance pairs) can be
timed on an internally-consistent size ladder. Deterministic (seed 42).
Outputs under target/scale/ (gitignored; ~25 MB at 10x).
"""
import os, random
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ("batch part spark line column order small sort fast value scan hash "
         "slow group query agg table vector plan join shuffle stage task node "
         "cache disk row key map reduce a b").split()[:31]
LANGS = ["en", "en", "en", "de", "fr", "es", "pt"]  # en-heavy like fixture
COLORS = ("red blue green hot cold large small shiny dull metal "
          "plastic round flat long short heavy light dark pale worn").split()
NOUNS = "ring bolt nut screw washer gear cog pin rod plate".split()

def gen_documents(n, rng):
    docs = []
    for i in range(n):
        ln = rng.randint(10, 100)
        toks = [rng.choice(VOCAB) for _ in range(ln)]
        docs.append((i, " ".join(toks), rng.choice(LANGS),
                     f"src{rng.randrange(20)}"))
    # exact dups (~0.2%) + near dups (~1%): same density at every size
    for j in range(n // 500):
        src = rng.randrange(len(docs) - 1)
        docs[src + 1] = (docs[src + 1][0], docs[src][1],
                         docs[src][2], docs[src][3])
    for j in range(n // 100):
        src = rng.randrange(len(docs) - 1)
        toks = docs[src][1].split()
        toks[rng.randrange(len(toks))] = rng.choice(VOCAB)
        docs[src + 1] = (docs[src + 1][0], " ".join(toks),
                         docs[src][2], docs[src][3])
    return pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": [d[1] for d in docs],
        "lang": [d[2] for d in docs],
        "source": [d[3] for d in docs],
        "n_chars": pa.array([len(d[1]) for d in docs], pa.int64()),
    })

def gen_part(n, rng):
    return pa.table({
        "p_partkey": pa.array(range(1, n + 1), pa.int64()),
        "p_brand": [f"Brand#{rng.randrange(1, 26)}" for _ in range(n)],
        "p_name": [f"{rng.choice(COLORS)} {rng.choice(NOUNS)}"
                   for _ in range(n)],
    })

if __name__ == "__main__":
    base = os.path.join(os.path.dirname(__file__), "..", "target", "scale")
    for label, mult in [("x1", 1), ("x3", 3), ("x10", 10)]:
        rng = random.Random(42)
        d = os.path.join(base, label)
        os.makedirs(d, exist_ok=True)
        pq.write_table(gen_documents(5000 * mult, rng),
                       os.path.join(d, "documents.parquet"))
        pq.write_table(gen_part(20000 * mult, rng),
                       os.path.join(d, "part.parquet"))
        print("wrote", d)
