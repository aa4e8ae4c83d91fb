"""Summarize a case run's metrics JSONL into a compact markdown table
(momentum / kinetic-energy / max-speed sanity at VTK cadence).

Usage: python tools/case_summary.py <metrics.jsonl> [every_k]
"""

import json
import sys


def main():
    path = sys.argv[1]
    every = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    rows = []
    for line in open(path):
        m = json.loads(line)
        if "kinetic_energy" in m:
            rows.append(m)
    print("| step | time | max speed [m/s] | KE [J] | px [kg m/s] "
          "| py [kg m/s] | nbr max | window len |")
    print("|---|---|---|---|---|---|---|---|")
    picks = rows[::every]
    if rows and rows[-1] is not (picks[-1] if picks else None):
        picks.append(rows[-1])
    for m in picks:
        print(f"| {m['step']} | {m['time']:.3f} | {m['max_speed']:.4f} "
              f"| {m['kinetic_energy']:.4e} | {m['momentum_x']:+.3e} "
              f"| {m['momentum_y']:+.3e} | {m['neighbor_max']} "
              f"| {m.get('window_len', 0)} |")


if __name__ == "__main__":
    main()
