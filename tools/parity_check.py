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

PAIRS = [
    ("/tmp/graft_parity/ref.csv", "/tmp/graft_parity/spark.csv"),
    ("/tmp/graft_parity/ref_filtered.csv", "/tmp/graft_parity/spark_filtered.csv"),
    ("/tmp/graft_parity/ref_toolfocus.csv", "/tmp/graft_parity/spark_toolfocus.csv"),
    ("/tmp/graft_parity/ref_offset.csv", "/tmp/graft_parity/spark_offset.csv"),
]


def main():
    rc = 0
    for ref_path, spark_path in PAIRS:
        ref = open(ref_path).read().splitlines()
        spark = open(spark_path).read().splitlines()
        name = ref_path.rsplit("/", 1)[-1]
        if ref == spark:
            print(f"[parity] OK {name}: {len(ref) - 1} rows byte-identical")
            continue
        print(f"[parity] MISMATCH {name}: ref {len(ref)} vs spark {len(spark)} lines")
        rs, ss = set(ref), set(spark)
        for l in list(rs - ss)[:4]:
            print("  only-ref  :", l)
        for l in list(ss - rs)[:4]:
            print("  only-spark:", l)
        rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
