"""Measure the fused Gram build at varying segmentation (TPU A/B tool).

Round-5 experiment (NEGATIVE result, code reverted): a pipelined build
variant sliced the flat nnz stream per segment with rebased offsets so
segment k+1's H2D copy could overlap segment k's panel GEMMs. Measured
with this tool (protocol below), it LOST:

  rcv1-like  (24 panels, ~9 MB stream): single program seg_p=64
      median 0.73 s; sliced seg_p=12/8/4 medians 0.71-0.73 s — parity,
      the ~0.3 s of potential overlap eaten by extra relay dispatches.
  news20-like (22 ACTIVE panels after empty-column compaction — NOT
      662; ~53 MB stream): single program medians 3.3-4.6 s across
      runs (relay variance); sliced seg_p=8/6 medians 5.8-6.0 s —
      clearly worse: transfers serialize with dispatches on the relayed
      PJRT transport, so copy/compute overlap never materializes, and
      each extra dispatch + the uniform-length slice padding are pure
      cost.

Conclusion: the whole-stream layout (ops/gram.build_gram_fused) stays;
build time is bounded by the serialized relay transfer (~30 MB/s), not
by a transfer/compute serialization the host controls.

Protocol (same as bench.py's timed build): warm the executables over
device-created zeros first (warm_build_gram_fused), then time
build_gram_fused end-to-end — the timed region pays the real data
transfer + device execution. Reports min and median per variant.

Usage:  python tools/measure_build_pipeline.py [--dataset rcv1-like]
        [--reps 5] [--seg_p 64 16 8]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="rcv1-like")
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--seg_p", type=int, nargs="+", default=[64, 16, 8])
    args = p.parse_args()

    import jax.numpy as jnp

    from krylov_crn_tpu.config import enable_compilation_cache
    from krylov_crn_tpu.data.synthetic import synthetic_logreg
    from krylov_crn_tpu.ops.gram import (
        build_gram_fused,
        warm_build_gram_fused,
    )

    enable_compilation_cache()
    float(jnp.zeros(8)[0])  # absorb PJRT client init

    A, b = synthetic_logreg(args.dataset, seed=0)
    A = A.tocsr()
    n, d = A.shape
    x0 = np.ones(d) * 0.5
    dtype = np.float32
    vdt = jnp.dtype(jnp.float32)

    from krylov_crn_tpu.ops.gram import pad_rows

    npad = pad_rows(n)
    ibuf = np.zeros(3 * npad + 3, dtype)

    results = {}
    for seg_p in args.seg_p:
        warm_build_gram_fused(A, dtype, vdt, low_res_lanczos=False,
                              seg_p=seg_p)
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            gd, flat = build_gram_fused(A, b, x0, ibuf, dtype, vdt,
                                        low_res_lanczos=False,
                                        seg_p=seg_p)
            # force completion: fetch a scalar data-dependent on K
            float(gd.K[0, 0])
            times.append(time.perf_counter() - t0)
            del gd, flat
        results[seg_p] = {"min_s": round(min(times), 3),
                          "median_s": round(float(np.median(times)), 3),
                          "all_s": [round(t, 3) for t in times]}
        print(f"seg_p={seg_p}: min {results[seg_p]['min_s']} "
              f"median {results[seg_p]['median_s']} {results[seg_p]['all_s']}",
              flush=True)

    print(json.dumps({"dataset": args.dataset, "n": n, "d": d,
                      "nnz": int(A.nnz), "results": results}))


if __name__ == "__main__":
    main()
