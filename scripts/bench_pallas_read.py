"""On-chip Pallas bank-read retry with a compile budget (VERDICT r2 #6).

Round 1/2 only ever validated ops/attention_pallas.py in interpret mode;
this script compiles it on the REAL TPU at small block configs first, each
attempt bounded by VFLOOD_PALLAS_COMPILE_BUDGET seconds (default 600) in a
subprocess so a hung/pathological compile cannot eat the session, then
times the surviving configs against the XLA dense read
(ops.attention.bank_attention_read) with honest chained+forced timing.

Prints a WIN/LOSS verdict per (N, chunk); the outcome is recorded in
docs/ROADMAP.md either way.

Run: python scripts/bench_pallas_read.py            # orchestrator
     python scripts/bench_pallas_read.py --one N CHUNK   # single attempt
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COMPILE_BUDGET_S = int(os.environ.get("VFLOOD_PALLAS_COMPILE_BUDGET", "600"))
DK, DV, P = 128, 512, 1200


def run_one(n: int, chunk: int) -> None:
    """Compile + time one config; prints one result line. Run inside the
    budget subprocess."""
    import numpy as np

    from vfloodnet_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from scripts._bench_timing import timeit
    from vfloodnet_tpu import ops
    from vfloodnet_tpu.ops.attention_pallas import pallas_bank_read

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    rng = np.random.RandomState(0)
    keys = jnp.asarray(rng.randn(n, DK).astype(np.float32), jnp.bfloat16)
    values = jnp.asarray(rng.randn(n, DV).astype(np.float32), jnp.bfloat16)
    valid = jnp.asarray(np.arange(n) < int(n * 0.75))
    q = jnp.asarray(rng.randn(P, DK).astype(np.float32), jnp.bfloat16)

    t0 = time.time()
    mem, cnt = pallas_bank_read(keys, values, valid, q, chunk=chunk)
    from vfloodnet_tpu.utils import force
    force(mem)
    compile_s = time.time() - t0
    assert np.isfinite(np.asarray(mem)).all()

    t_pallas = timeit(lambda k, v, ok, qq: pallas_bank_read(
        k, v, ok, qq, chunk=chunk)[0], keys, values, valid, q, iters=10)

    def dense(k, v, ok, qq):
        return ops.bank_attention_read(k, v, ok, qq, impl="xla")[0]

    t_dense = timeit(dense, keys, values, valid, q, iters=10)
    verdict = "WIN" if t_pallas < t_dense else "LOSS"
    print(f"N={n} chunk={chunk}: pallas {t_pallas:.3f} ms vs "
          f"xla-dense {t_dense:.3f} ms -> {verdict} "
          f"(first compile+run {compile_s:.1f}s)", flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        run_one(int(sys.argv[2]), int(sys.argv[3]))
        return

    configs = [(16384, 1024), (16384, 2048), (16384, 4096),
               (98304, 2048), (98304, 4096)]
    for n, chunk in configs:
        cmd = [sys.executable, "-u", os.path.abspath(__file__),
               "--one", str(n), str(chunk)]
        print(f"--- attempt N={n} chunk={chunk} "
              f"(budget {COMPILE_BUDGET_S}s) ---", flush=True)
        try:
            out = subprocess.run(cmd, timeout=COMPILE_BUDGET_S,
                                 capture_output=True, text=True)
            sys.stdout.write(out.stdout)
            if out.returncode != 0:
                tail = (out.stderr or "").strip().splitlines()[-8:]
                print(f"N={n} chunk={chunk}: FAILED rc={out.returncode}"
                      + ("\n  " + "\n  ".join(tail) if tail else ""),
                      flush=True)
        except subprocess.TimeoutExpired:
            print(f"N={n} chunk={chunk}: compile budget exceeded "
                  f"({COMPILE_BUDGET_S}s) — counted as LOSS", flush=True)
            # NOTE: the killed subprocess may leave an orphaned remote
            # compile; give the relay a moment before the next attempt.
            time.sleep(30)


if __name__ == "__main__":
    main()
