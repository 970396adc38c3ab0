"""Finer VQA serving batch sweep around the 256/512 winners
(VERDICT r2 item #6 cheap lever): B in {320, 384, 448}.

Reuses bench.measure_vqa verbatim (same timing discipline, same int8
engine) so numbers are directly comparable to BENCH_r*.json.

Usage: python scripts/drive_vqa_sweep.py [--bs 320,384,448]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", default="320,384,448")
    ns = ap.parse_args()

    import bench
    from xlxmert_tpu.core.config import LxmertConfig

    bs = tuple(int(b) for b in ns.bs.split(","))
    qps, qps_bf16, path, bucketed = bench.measure_vqa(
        LxmertConfig(), Bs=bs, verbose=True)
    print(f"best: {qps:.1f} q/s ({path}); bf16 {qps_bf16:.1f}; "
          f"bucketed mix {bucketed:.1f}")


if __name__ == "__main__":
    main()
