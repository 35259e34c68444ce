#!/usr/bin/env python3
"""Head-to-head single-node throughput: the PATCHED reference pipeline
(tools/ref_golden.py) vs the graft Spark pipeline (graft.ParityDump) on
the SAME generated corpus — the two run byte-identical workloads
(tools/parity_check.py proves output parity on the small fixtures).

Both sides are timed as whole subprocesses (interpreter/JVM startup
included — the honest end-to-end number) over a deterministic mixed
corpus: browsing sessions with repeats, risky URIs, rule hits,
qualifying 500-bursts, tool-keyword sequences, cross-file duplicates.

Usage: throughput_compare.py [n_lines] [--skip-ref]
Writes /tmp/graft_throughput/ and prints a result table for
THROUGHPUT.md.
"""
import os
import random
import subprocess
import sys
import time

BASE = "/tmp/graft_throughput"
LOGS = os.path.join(BASE, "logs")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def apache(ip, ts, method, uri, status, size, ref='-', ua='Mozilla/5.0'):
    return (f'{ip} - - [{ts}] "{method} {uri} HTTP/1.1" {status} {size} '
            f'"{ref}" "{ua}"')


def fmt(epoch):
    return time.strftime("%d/%b/%Y:%H:%M:%S +0000", time.gmtime(epoch))


def gen_corpus(n_lines):
    rnd = random.Random(42)
    os.makedirs(LOGS, exist_ok=True)
    t0 = 1745229600  # 2025-04-21 10:00:00 UTC
    uas = ["Mozilla/5.0", "curl/8.1", "sqlmap/1.7", "python-requests/2.31"]
    files = [[], [], []]

    # ~90% browsing traffic: per-ip sessions with repeats
    n_browse = int(n_lines * 0.9)
    ips = [f"10.{rnd.randrange(200)}.{rnd.randrange(200)}.{rnd.randrange(1, 250)}"
           for _ in range(max(50, n_lines // 100))]
    t = t0
    for i in range(n_browse):
        ip = rnd.choice(ips)
        t += rnd.choice([0, 1, 2, 5, 80])  # mixes <60s gaps and session breaks
        uri = f"/page/p{rnd.randrange(50)}"
        r = rnd.random()
        if r < 0.02:
            uri += "?q=%2e%2e%2fetc"
        elif r < 0.03:
            uri = "/upload/shell.php?cmd=whoami"
        elif r < 0.04:
            uri = "/db/dump.sql"
        status = 200 if rnd.random() < 0.9 else rnd.choice([302, 404, 403, 500])
        files[rnd.randrange(3)].append(apache(
            ip, fmt(t), rnd.choice(["GET", "POST", "HEAD"]), uri, status,
            rnd.randrange(40, 9000), ua=rnd.choice(uas)))

    # 500-bursts (W2): ~5% of lines in qualifying bursts + success rows
    n_burst_rows = int(n_lines * 0.05)
    burst = 0
    while burst * 130 < n_burst_rows:
        ip = f"192.0.2.{burst % 250 + 1}"
        bt = t0 + 4000 * burst
        for i in range(120):
            files[0].append(apache(ip, fmt(bt + i), "POST", f"/api/fuzz{burst}", 500, 40))
        files[0].append(apache(ip, fmt(bt + 150), "GET", f"/api/fuzz{burst}", 200, 60))
        burst += 1

    # tool sequences (W3): ~2% of lines — all three keywords within one
    # session (20s apart) so the scan actually fires
    n_tool = int(n_lines * 0.02)
    kws = ["/.access", "/x.bak_0.log", "/.chef/config.rb"]
    for s in range(n_tool // 3):
        ip = f"198.51.100.{s % 200 + 1}"
        st = t0 + s * 900
        for j, kw in enumerate(kws):
            files[1].append(apache(ip, fmt(st + j * 20), "GET", kw, 404, 30))

    # cross-file duplicates (D1): ~1% copied verbatim into another file
    for line in files[0][: int(n_lines * 0.01)]:
        files[2].append(line)

    total = 0
    for idx, lines in enumerate(files):
        with open(os.path.join(LOGS, f"srv{idx}.log"), "w") as fp:
            fp.write("\n".join(lines) + "\n")
        total += len(lines)
    return total


def run_timed(cmd, env=None):
    t0 = time.time()
    p = subprocess.run(cmd, capture_output=True, text=True, env=env)
    dt = time.time() - t0
    if p.returncode != 0:
        print(p.stdout[-2000:])
        print(p.stderr[-2000:])
        raise SystemExit(f"FAILED ({p.returncode}): {' '.join(cmd[:3])} ...")
    return dt, p.stdout


def main():
    n_lines = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 200_000
    skip_ref = "--skip-ref" in sys.argv

    # parity fixtures provide rules.yaml/shells.txt both sides load
    subprocess.run([sys.executable, os.path.join(REPO, "tools", "make_parity_fixtures.py")],
                   check=True, capture_output=True)

    total = gen_corpus(n_lines)
    print(f"[throughput] corpus: {total} lines in {LOGS}")

    # --- graft (JVM startup + Spark session + pipeline + CSV dumps) ---
    jdk_opens = []
    for p in ["java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
              "java.net", "java.nio", "java.util", "java.util.concurrent",
              "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
              "sun.security.action", "sun.util.calendar"]:
        jdk_opens += ["--add-opens", f"java.base/{p}=ALL-UNNAMED"]
    cp = f"{REPO}/target/scala-2.13/classes:/opt/spark/jars/*"
    graft_cmd = (["java"] + jdk_opens +
                 ["-Xmx8g", "-Dspark.ui.enabled=false",
                  "-Dspark.sql.session.timeZone=UTC", "-cp", cp,
                  "graft.ParityDump", LOGS, os.path.join(BASE, "graft.csv")])
    env = dict(os.environ, SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "16"))
    graft_s, out = run_timed(graft_cmd, env=env)
    graft_rows = [l for l in out.splitlines() if "parity_dump" in l]
    print(f"[throughput] graft: {graft_s:.1f}s  ({'; '.join(graft_rows)})")

    # --- reference (interpreter + imports + pipeline + CSV dumps) ---
    if not skip_ref:
        ref_s, out = run_timed(
            [sys.executable, os.path.join(REPO, "tools", "ref_golden.py"),
             LOGS, os.path.join(BASE, "ref.csv")])
        ref_rows = [l for l in out.splitlines() if "ref_golden" in l]
        print(f"[throughput] reference: {ref_s:.1f}s  ({'; '.join(ref_rows)})")
        print(f"[throughput] RESULT lines={total} graft_s={graft_s:.1f} "
              f"ref_s={ref_s:.1f} speedup={ref_s / graft_s:.2f}x")
    else:
        print(f"[throughput] RESULT lines={total} graft_s={graft_s:.1f} (ref skipped)")


if __name__ == "__main__":
    main()
