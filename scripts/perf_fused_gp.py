"""A/B: fused whole-marginal Pallas GP kernel vs the XLA GP path.

Measures (1) the isolated GP segment (fwd+grad at flagship shapes) and
(2) the full flagship AutoDG train step, with ``use_fused_gp`` off/on.
Run from the repo root on the TPU:  python scripts/perf_fused_gp.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import bench_gp_segment, bench_jax  # noqa: E402


def main():
    gp_xla = bench_gp_segment()
    gp_fused = bench_gp_segment(fused=True, flops_ref=gp_xla["gflops"] * 1e9)
    print(f"GP segment (fwd+grad, b=256 n=288 d=32 m=256):")
    print(f"  XLA   : {gp_xla['ms']:.3f} ms  ({gp_xla['tflops']:.1f} TFLOP/s)")
    print(f"  fused : {gp_fused['ms']:.3f} ms  "
          f"({gp_fused['tflops']:.1f} TFLOP/s effective)")

    step_xla = bench_jax(fused=False)
    step_fused = bench_jax(fused=True)
    print("flagship AutoDG train step:")
    print(f"  XLA GP   : {1e3 / step_xla['steps_per_sec']:.3f} ms/step "
          f"({step_xla['steps_per_sec']:.1f} steps/s)")
    print(f"  fused GP : {1e3 / step_fused['steps_per_sec']:.3f} ms/step "
          f"({step_fused['steps_per_sec']:.1f} steps/s)")


if __name__ == "__main__":
    main()
