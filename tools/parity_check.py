#!/usr/bin/env python3
"""End-to-end parity gate: REFERENCE implementation vs the Spark engine
on the same fixture logs, same config. Byte-compares the sorted
engine-state CSVs.

Run from /root/repo:
    python3 tools/make_parity_fixtures.py
    python3 tools/ref_golden.py /tmp/graft_parity/logs /tmp/graft_parity/ref.csv
    sbt -batch "runMain graft.ParityDump /tmp/graft_parity/logs /tmp/graft_parity/spark.csv"
    python3 tools/parity_check.py
"""
import sys

REF = "/tmp/graft_parity/ref.csv"
SPARK = "/tmp/graft_parity/spark.csv"


def main():
    ref = open(REF).read().splitlines()
    spark = open(SPARK).read().splitlines()
    if ref == spark:
        print(f"[parity] OK: {len(ref) - 1} rows byte-identical")
        return 0
    print(f"[parity] MISMATCH: ref {len(ref)} lines vs spark {len(spark)} lines")
    rs, ss = set(ref), set(spark)
    for l in list(rs - ss)[:5]:
        print("  only-ref  :", l)
    for l in list(ss - rs)[:5]:
        print("  only-spark:", l)
    return 1


if __name__ == "__main__":
    sys.exit(main())
