#!/usr/bin/env python3
"""Generate deterministic fixture access logs that light up every engine
stage: multi-format parsing, cross-source dedup, sessionization, request
counts, rule engine, a qualifying 500-burst with a success row (W2), and
tool-signature hits within a window (W3). Writes /tmp/graft_parity/.
"""
import os

BASE = "/tmp/graft_parity"
LOGS = os.path.join(BASE, "logs")


def apache(ip, hh, mm, ss, method, uri, status, size, ref='-', ua='Mozilla/5.0'):
    return (f'{ip} - - [21/Apr/2025:{hh:02d}:{mm:02d}:{ss:02d} +0000] '
            f'"{method} {uri} HTTP/1.1" {status} {size} "{ref}" "{ua}"')


def main():
    os.makedirs(LOGS, exist_ok=True)

    a = []
    # normal browsing: 2 sessions for one ip (gap > 60s), repeats for counts
    for i in range(5):
        a.append(apache("203.0.113.7", 10, 0, i * 10, "GET", "/index.html", 200, 512))
    for i in range(3):
        a.append(apache("203.0.113.7", 10, 5, i * 5, "GET", "/about.html", 200, 256))
    # risky uri + webshell + whoami rule hits
    a.append(apache("203.0.113.7", 10, 5, 30, "POST", "/upload/shell.php?cmd=whoami", 200, 801))
    a.append(apache("203.0.113.7", 10, 5, 40, "GET", "/%2e%2e/etc/passwd", 404, 100))
    a.append(apache("198.51.100.9", 10, 6, 0, "GET", "/db/dump.sql", 200, 9000, ref="https://fofa.info/x", ua="sqlmap/1.7"))
    # static extensions (filtered only at query time, still parsed)
    a.append(apache("198.51.100.9", 10, 6, 5, "GET", "/style.css", 200, 100))
    # W2: 120-row 500 burst at 1s intervals then a 200 on the same uri
    for i in range(120):
        a.append(apache("192.0.2.66", 11, i // 60, i % 60, "POST", "/api/fuzz", 500, 40))
    a.append(apache("192.0.2.66", 11, 2, 30, "GET", "/api/fuzz", 200, 60))  # 31s after burst end: same session
    # W3: DirSearch keywords within the window
    for i, kw in enumerate(["/.access", "/x.bak_0.log", "/.chef/config.rb"]):
        a.append(apache("192.0.2.99", 12, 0, i * 25, "GET", kw, 404, 30))  # 25s apart: one session
    # duplicate lines: same within file (kept) and cross-file (dropped)
    dup = apache("203.0.113.50", 13, 0, 0, "GET", "/dup.html", 200, 77)
    a.append(dup)
    a.append(dup)

    # NOTE: no cross-source duplicate here. The reference's
    # _remove_dups computes drop indices from a merge with a RESET index
    # (dataframe.py:192: df[cols].merge(...).index is positional), so its
    # cross-source dedup is a latent no-op; our engine implements the
    # documented intent and the divergence is pinned in NormalizerSpec.
    # Parity fixtures therefore avoid the divergent case.
    b = []
    b.append(apache("203.0.113.51", 13, 1, 0, "HEAD", "/other.html", 302, 0))
    # iis format lines in the second file
    b.append("2025-04-21 13:02:00 W3SVC1 GET /default.aspx - 443 - 10.0.0.77 Mozilla/5.0+(Windows) - 500 0 0 1320")
    b.append("2025-04-21 13:02:30 W3SVC1 PUT /upload.aspx - 443 - 10.0.0.77 Mozilla/5.0+(Windows) - 201 0 0 10")
    # clf + no_method + unknown formats
    b.append('203.0.113.60 - - [21/Apr/2025:13:03:00 +0000] "GET /clf.html HTTP/1.0" 200 55')
    b.append('203.0.113.61 - - [21/Apr/2025:13:04:00 +0000] "quit" 400 226 "-" "-"')
    b.append('w1 p2 f3 203.0.113.62 - - [21/Apr/2025:13:05:00 +0000] "GET /health HTTP/1.1" 200 17')
    b.append("#comment line")
    b.append("garbage that will not parse")

    with open(os.path.join(LOGS, "a.log"), "w") as fp:
        fp.write("\n".join(a) + "\n")
    with open(os.path.join(LOGS, "b.log"), "w") as fp:
        fp.write("\n".join(b) + "\n")

    with open(os.path.join(BASE, "rules.yaml"), "w") as fp:
        fp.write("""- title: Suspicious URI & OK Status
  detection: { selection: { uri_risk|gte: 70, status: [200, 201, 202], resp_size|gte: 25 } }
  tags: [ { risk_score: 75.0 } ]
- title: Shell Command & Status Success
  detection: { selection: { status: [200, 201, 202], resp_size|gte: 25, request_uri|contains: 'whoami' } }
  tags: [ { risk_score: 71.1 } ]
- title: Suspicious Referrer
  detection: { selection: { referrer|contains: fofa.info } }
  tags: [ { risk_score: 67.5 } ]
- title: Status Code Risk
  detection: { selection: { status_risk|gte: 70 } }
  tags: [ { risk_score: 40.0 } ]
""")
    with open(os.path.join(BASE, "shells.txt"), "w") as fp:
        fp.write("# shells\nshell.php\ncmd.php\nc99.php\n")
    print(f"[fixtures] wrote {len(a)}+{len(b)} lines under {LOGS}")


if __name__ == "__main__":
    main()
