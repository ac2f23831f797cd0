"""Similarity-family stress bench at ~1M-doc scale (round-4 task: the
pair kernels were previously benched only at sf0.1 = 5k docs, while
being the most expensive shipped paths).

Generates a deterministic prose-like documents corpus (Zipf-ish draws
from a 100k-word vocabulary so the shingle space has a realistic long
tail, unlike the small-vocab testdata word salad), with planted
structure:

- every 1000th doc gets an exact duplicate AND a ~10 %-edit near-dup
  (the true pairs the kernels must move);
- a fixed 12-token boilerplate sentence prefixes 1/16 ≈ 6.25 % of
  docs — its 3-gram shingles reach df ≈ 0.0625·N, far above
  SHINGLE_DF_CAP at stress scale, so the stop-shingle cap (round-4)
  is exercised (dropped loudly instead of expanding O(df²) pairs from
  one group), and ABOVE tfidf_pairs' 5 %-of-corpus stop-term gate at
  every scale (5 % exactly would sit on that cap's boundary and keep
  C(0.05·N, 2) pairs);
- a second, rarer boilerplate on ~0.04 % of docs sits UNDER the cap
  and must still contribute pairs.

Generation is itself a Ray Data job (one task per shard, seeded by
shard index).  Usage:

    python tools/bench_similarity_1m.py [n_docs] [out_json]

Writes one JSON line with per-query wall times + row counts, suitable
for pasting into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_SHARDS = 64
VOCAB = 100_000
DOC_LEN = 48
BOILER_HOT = ("subscribe to our newsletter for updates terms of "
              "service apply today").split()      # df ≈ 6.25 % of corpus
BOILER_COLD = ("this message was scanned by legacy archiver "
               "version seven").split()           # df ≈ 0.04 %


def _shard_table(shard: int, docs_per_shard: int) -> pa.Table:
    """Deterministic shard: ids are globally dense, text is Zipf-ish
    prose; planted dup/near-dup rows key off the GLOBAL doc ordinal so
    the plant density is scale-invariant.  Planted-row id offsets
    (+500M/+600M) stay clear of the +10M re-keying
    documents_lsh_join_exact applies to its bench side.  Token draws
    are one vectorized searchsorted over the shard (a per-doc
    ``rng.choice(p=...)`` rebuilds the 100k-entry CDF every call)."""
    rng = np.random.RandomState(1_000_003 * shard + 17)
    base = shard * docs_per_shard
    # Zipf-ish: rank r drawn ∝ 1/(r+10), heavy head + long tail
    w = 1.0 / (np.arange(VOCAB) + 10.0)
    cdf = np.cumsum(w / w.sum())
    draws = np.searchsorted(cdf, rng.random_sample(
        (docs_per_shard, DOC_LEN))).astype(np.int64)
    ids, texts = [], []
    for i in range(docs_per_shard):
        gid = base + i
        toks = [f"w{t}" for t in draws[i]]
        if gid % 16 == 0:
            toks = BOILER_HOT + toks[len(BOILER_HOT):]
        if gid % 2500 == 0:
            toks = BOILER_COLD + toks[len(BOILER_COLD):]
        text = " ".join(toks)
        ids.append(gid)
        texts.append(text)
        if gid % 1000 == 0:           # plant exact dup + near-dup
            ids.append(gid + 500_000_000)
            texts.append(text)
            edited = toks[:]
            for pos in rng.choice(len(toks), size=5, replace=False):
                edited[pos] = f"w{rng.randint(VOCAB)}"
            ids.append(gid + 600_000_000)
            texts.append(" ".join(edited))
    # source / n_chars let the corpus-statistics and keep-best ops run
    # at stress scale too (source = 20 round-robin feeds, like testdata)
    id_arr = np.array(ids, np.int64)
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string()),
                     "source": pa.array([f"src{g % 20}" for g in id_arr],
                                        pa.string()),
                     "n_chars": pa.array([len(t) for t in texts],
                                         pa.int64())})


def generate(out_dir: str, n_docs: int) -> int:
    import ray

    os.makedirs(out_dir, exist_ok=True)
    docs_per_shard = n_docs // N_SHARDS

    @ray.remote
    def write_shard(shard: int) -> int:
        t = _shard_table(shard, docs_per_shard)
        pq.write_table(t, os.path.join(out_dir,
                                       f"documents-{shard:05d}.parquet"))
        return t.num_rows

    total = sum(ray.get([write_shard.remote(s) for s in range(N_SHARDS)]))
    return total


def main() -> int:
    import ray

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    out_json = sys.argv[2] if len(sys.argv) > 2 else None
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    corpus = f"/tmp/simbench_{n_docs}_v2"   # v2: + source / n_chars
    marker = os.path.join(corpus, "_DONE")
    t0 = time.perf_counter()
    if not os.path.exists(marker):
        total = generate(corpus, n_docs)
        with open(marker, "w") as f:
            f.write(str(total))
    total = int(open(marker).read())
    gen_s = time.perf_counter() - t0

    # the queries expect <sf_dir>/documents.parquet; the shard files are
    # the dataset dir itself
    link = os.path.join(corpus, "documents.parquet")
    if not os.path.exists(link):
        os.makedirs(link, exist_ok=True)
        for f in os.listdir(corpus):
            if f.startswith("documents-"):
                os.rename(os.path.join(corpus, f), os.path.join(link, f))

    import ocr_engine_ray.pipelines.queries as q

    default_queries = ("documents_minhash_neardup,documents_jaccard_pairs,"
                       "documents_tfidf_pairs,documents_containment_pairs,"
                       "documents_decontaminate,documents_lsh_join_exact")
    # SIMBENCH_QUERIES overrides the list — e.g. exact tfidf all-pairs
    # is O(Σ df²) BY DEFINITION and intrinsically ~5×10⁹ candidate pairs
    # on 1M Zipf docs even under both df caps (measured: 54 GB spilled
    # before the run was stopped); bench it at the scale where the exact
    # oracle is meant to run and use minhash_join/LSH as the scale path.
    results: dict = {}
    for name in os.environ.get("SIMBENCH_QUERIES",
                               default_queries).split(","):
        fn = getattr(q, "q_" + name)
        t0 = time.perf_counter()
        try:
            res = fn(corpus)
            rows = res.count() if hasattr(res, "count") else res.num_rows
            results[name] = {"sec": round(time.perf_counter() - t0, 2),
                             "rows": int(rows)}
        except Exception as e:  # record, don't abort the sweep
            results[name] = {"sec": round(time.perf_counter() - t0, 2),
                             "error": f"{type(e).__name__}: {e}"[:200]}
        print(f"## {name}: {results[name]}", flush=True)

    out = {"metric": "similarity-family wall time at stress scale",
           "n_docs": total, "gen_sec": round(gen_s, 2),
           "num_cpus": cpus, "queries": results}
    line = json.dumps(out)
    print(line)
    if out_json:
        with open(out_json, "w") as f:
            f.write(line + "\n")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
