"""Streaming ANN probe scale measurement (r10, verdict item 3).

Measures the per-micro-batch wall of the streaming similarity probe
(`streaming/ann.py`) against rolled-copy proxy corpora (the
scale_proxy builder): a frozen persisted IVF index is built ONCE per
corpus, then B arriving vectors are pushed through the exact
`topk_ingest` foreachBatch callable into a throwaway UpsertSink — the
production code path, minus the trigger loop.

Axes:
- corpus scale (1×/10×/30×): with nprobe/nlist fixed the candidate
  stream per batch is B·n·(nprobe/nlist), so the batch wall should grow
  ~linearly with n — i.e. with the probed-cell fraction OF the corpus,
  never with a per-batch index rebuild (which would add an O(n·iters)
  term and show as super-linear jumps).
- nlist (32/128 at the largest scale): corpus FIXED, fraction ÷4 — the
  wall must track the fraction, proving the cost driver is the
  candidate stream, not the corpus size.

Run: python -m zio_kinesis_example_spark.tools.streaming_scale \
        [copies ...] (default 1 10 30)
One JSON line per configuration; BASELINE.md carries the digest.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

from .scale_proxy import SRC, build_proxy

BATCH = 200      # arriving vectors per micro-batch
N_BATCHES = 3    # timed batches (first includes candidate-plan warmup)


def measure(spark, dir_: str, nlist: int | None) -> dict:
    from pyspark.sql import functions as F

    from ..streaming import UpsertSink, ivf_index, topk_ingest

    t0 = time.time()
    corpus_cells, Cn = ivf_index(spark, dir_, nlist=nlist)
    n = corpus_cells.count()          # materializes the persisted frame
    index_wall = round(time.time() - t0, 1)

    state = tempfile.mkdtemp(prefix="zke-annscale-")
    sink = UpsertSink(state, key="query_id", seq_col="neighbors")
    ingest = topk_ingest(sink, corpus_cells, Cn)

    e = spark.read.parquet(os.path.join(dir_, "embeddings.parquet"))
    walls = []
    for b in range(N_BATCHES):
        # EXACTLY BATCH rows per micro-batch at every corpus scale
        # (r10 review: a mod-997 residue class holds only ~n/997 rows,
        # so the batch size silently grew with n and confounded the
        # scale axis); disjoint contiguous id ranges are deterministic.
        batch = (
            e.filter((F.col("vec_id") >= b * BATCH)
                     & (F.col("vec_id") < (b + 1) * BATCH))
            .select(F.col("vec_id").alias("query_id"),
                    F.col("embedding").cast("array<double>").alias("emb"))
        )
        t0 = time.time()
        ingest(batch, batch_id=b)
        walls.append(round(time.time() - t0, 2))
    corpus_cells.unpersist()
    return {"dir": dir_, "n": int(n), "nlist": nlist or "default(32)",
            "batch": BATCH, "index_wall": index_wall,
            "batch_walls": walls}


def main(argv):
    from ..session import get_spark

    copies = [int(a) for a in argv if a.isdigit()] or [1, 10, 30]
    spark = get_spark("zke-streaming-scale",
                      cpus=os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark.sparkContext.setLogLevel("ERROR")
    for k in copies:
        d = (os.path.dirname(SRC) if k == 1
             else build_proxy(f"/tmp/zke_proxy_{k}x", k))
        print(json.dumps(measure(spark, d, None)), flush=True)
    # nlist axis at the largest scale: fraction ÷4, corpus fixed
    biggest = max(copies)
    if biggest > 1:
        d = f"/tmp/zke_proxy_{biggest}x"
        print(json.dumps(measure(spark, d, 128)), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
