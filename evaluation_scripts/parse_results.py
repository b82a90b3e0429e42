"""Aggregate ETH3D results: "rmse auc 2cm/8cm" from a results log
(parity with /root/reference/evaluation_scripts/parse_results.py:1-37)."""

import re
import sys

import numpy as np


def extract_rmse_from_file(filepath):
    rmse_values = []
    pattern = re.compile(r"ATE RMSE:\s+([0-9]+\.[0-9]+)|^\s*rmse\s+"
                         r"([0-9]+\.[0-9]+)")
    with open(filepath) as f:
        for line in f:
            m = pattern.search(line)
            if m:
                rmse_values.append(float(m.group(1) or m.group(2)))
    return rmse_values


def main():
    rmse_list = extract_rmse_from_file(sys.argv[1])
    arr = 100 * np.array(rmse_list)
    print("rmse auc 2cm", np.sum(np.clip(2.0 - arr, 0.0, None)))
    print("rmse auc 8cm", np.sum(np.clip(8.0 - arr, 0.0, None)))
    print()
    print("Listing RMSE")
    for rmse in rmse_list:
        print(rmse)
    print(f"Average: {np.mean(rmse_list)}")


if __name__ == "__main__":
    main()
