"""Control experiment: raw-multiprocessing scaling of the linking
kernel, no Spark involved. Demonstrates the sandbox's effective CPU
capacity so the Spark scaling pair (bench.py --scaling) can be chosen
within it — on this microVM, 32 advertised vCPUs collapse past ~8-10
busy processes (32 procs measure ~3x slower than 8), so local[2] vs
local[8] is the honest N vs 4N stand-in.

Run: python BENCH/cpu_control.py  (needs .data/bench_conv_100000 —
created by `python bench.py --scaling` / ensure_bench_dataset)."""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".data", "bench_conv_100000",
)


def work(bounds: tuple[int, int]) -> int:
    import pandas as pd

    from grisp_spark.kg import oracle, spec
    from grisp_spark.kg.linking import _cached_word_vec

    n0, n1 = bounds
    kb = {
        n: pd.read_parquet(os.path.join(DATA, f"{n}.parquet"))
        for n in ("entities", "aliases", "label_stats")
    }
    conv = pd.read_parquet(os.path.join(DATA, "conversations.parquet")).iloc[n0:n1]
    gaz = oracle.build_gazetteer(kb)
    idx = spec.build_first_token_index(gaz)
    evecs = oracle.entity_vectors(kb)
    c = 0
    for row in conv.itertuples(index=False):
        tokens = spec.tokenize(row.text or "")
        if not tokens:
            continue
        for begin, end, surface in spec.detect_mentions(tokens, gaz, idx):
            senses = gaz[surface]
            total = sum(s[1] for s in senses)
            ctx = spec.centroid(tokens[:begin] + tokens[end:], _cached_word_vec)
            spec.pick_sense(
                [
                    (eid, spec.score_candidate(occ / total, spec.cosine(ctx, evecs[eid])))
                    for eid, occ, _ in senses
                ]
            )
            c += 1
    return c


def main() -> None:
    import pandas as pd

    n = len(pd.read_parquet(os.path.join(DATA, "conversations.parquet"), columns=["conv_id"]))
    for procs in (1, 2, 8, 32):
        chunks = [(i * n // procs, (i + 1) * n // procs) for i in range(procs)]
        t0 = time.monotonic()
        with mp.Pool(procs) as p:
            p.map(work, chunks)
        dt = time.monotonic() - t0
        print(f"{procs:>2} procs: {dt:6.2f}s  -> {n / dt:>9.0f} turns/s")


if __name__ == "__main__":
    main()
