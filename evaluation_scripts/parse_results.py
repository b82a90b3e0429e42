"""Summarize an ETH3D evaluation log.

Reads a results log containing per-sequence ATE lines (either our scripts'
"ATE RMSE: <m>" or evo's "rmse <m>" table rows) and prints the aggregate
area-under-curve scores at the 2 cm and 8 cm thresholds plus the raw list —
the metric the reference computes in evaluation_scripts/parse_results.py.
"""

from __future__ import annotations

import argparse


def rmse_of_line(line: str):
    """Extract an ATE RMSE value (meters) from one log line, else None."""
    s = line.strip()
    if s.lower().startswith("rmse"):
        tail = s[4:].lstrip(" \t:")
    elif "ATE RMSE" in s:
        tail = s.split("ATE RMSE", 1)[1].lstrip(" \t:")
    else:
        return None
    tok = tail.split()
    if not tok:
        return None
    try:
        return float(tok[0])
    except ValueError:
        return None


def auc_below(values_m, thresh_cm: float) -> float:
    """Sum of (thresh - rmse_cm) over sequences beating the threshold."""
    return sum(max(0.0, thresh_cm - 100.0 * v) for v in values_m)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("logfile", help="results log to summarize")
    args = ap.parse_args(argv)

    with open(args.logfile) as f:
        values = [v for v in map(rmse_of_line, f) if v is not None]

    print("rmse auc 2cm", auc_below(values, 2.0))
    print("rmse auc 8cm", auc_below(values, 8.0))
    print()
    print("Listing RMSE")
    for v in values:
        print(v)
    if values:
        print(f"Average: {sum(values) / len(values)}")


if __name__ == "__main__":
    main()
