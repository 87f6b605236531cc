"""Long-axis (>HBM) demo: 1M diffraction patterns in host-streaming mode.

BASELINE.json config 5 scaled to the attached single chip: the diffraction
data stays host-resident (the reference keeps it in pinned host memory and
streams 64-pattern chunks, `stream.py:285-404`); tike_tpu's solvers
double-buffer per-batch device uploads instead, so HBM only ever holds one
mini-batch plus the solver state.

Usage: python scripts/longaxis_demo.py [n_patterns] [det]
Writes LONGAXIS.md with the measured patterns/s and memory footprint.
"""

import json
import sys

sys.path.insert(0, ".")

from bench_all import bench_stream_1m


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    det = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    out = bench_stream_1m(n_patterns=n, det=det)
    print(json.dumps(out), flush=True)
    import jax

    with open("LONGAXIS.md", "w") as f:
        f.write(
            "# Long-axis (host-streaming) demo\n\n"
            "BASELINE config 5 on one chip: diffraction data host-resident, "
            "streamed per mini-batch with double-buffered uploads "
            "(`tike_tpu/ptycho/solvers/rpie.py` streaming mode; the "
            "reference's `stream.py:285-404` role).\n\n"
            f"- device: {jax.devices()[0]}\n"
            f"- patterns: {n:,} x {det}x{det} f32 "
            f"({out['host_data_gb']} GB host data)\n"
            f"- rPIE epoch: {out['epoch_s']} s -> "
            f"{out['value']:,} patterns/s\n"
            f"- peak host RSS: {out['peak_rss_gb']} GB; device holds one "
            f"{n // 100:,}-pattern batch + solver state only\n"
        )


if __name__ == "__main__":
    main()
