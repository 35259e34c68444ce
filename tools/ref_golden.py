#!/usr/bin/env python3
"""Run the REFERENCE implementation (patched copy: py3.12-only f-string
fixed, display-only deps stubbed) over fixture logs and dump the golden
engine-state CSV for parity checking against the Spark pipeline.

Usage: ref_golden.py <logdir> <out_csv>
"""
import importlib.util
import os
import shutil
import sys
import types

REF = "/root/reference"


def load_patched_reference(workdir):
    os.makedirs(workdir, exist_ok=True)
    pkg = os.path.join(workdir, "WebLogTriage")
    if os.path.exists(pkg):
        shutil.rmtree(pkg)
    shutil.copytree(os.path.join(REF, "WebLogTriage"), pkg)
    # dataframe.py:599 uses py3.12-only nested f-string quoting
    df_path = os.path.join(pkg, "dataframe.py")
    src = open(df_path).read()
    src = src.replace(
        """field = f'"{field.replace('"', '""')}"'""",
        'field = \'"\' + field.replace(\'"\', \'""\') + \'"\'')
    open(df_path, "w").write(src)

    # display-only deps are not installed; stub them (we never render)
    pt = types.ModuleType("prettytable")

    class PrettyTable:  # noqa: N801 - mimic the import surface
        pass

    pt.PrettyTable = PrettyTable
    sys.modules["prettytable"] = pt
    tc = types.ModuleType("termcolor")
    tc.colored = lambda s, *a, **k: s
    sys.modules["termcolor"] = tc

    sys.path.insert(0, workdir)

    def mod(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        m = importlib.util.module_from_spec(spec)
        sys.modules[name] = m
        spec.loader.exec_module(m)
        return m

    parser = mod("ref_parser", os.path.join(pkg, "parser.py"))
    dataframe = mod("ref_dataframe", df_path)
    risk = mod("ref_risk", os.path.join(pkg, "risk.py"))
    return parser, dataframe, risk


def main():
    logdir, out_csv = sys.argv[1], sys.argv[2]
    parser_m, df_m, risk_m = load_patched_reference("/tmp/ref_harness")

    os.chdir("/tmp/ref_harness")  # reference writes errors.log to cwd

    entries = parser_m.AccessLogParser().load_logfile([logdir])
    db = df_m.AccessLogDataFrame(entries)

    tool_signatures = [{
        "tool": "DS01", "name": "DirSearch",
        "description": "DirSearch using default dictionary (dicc.txt).",
        "keyword": ("/.access", ".bak_0.log", ".chef/config.rb"),
        "time_window": 7200,
    }]
    risk = risk_m.AccessLogRisk(
        tool_signatures=tool_signatures,
        uri_risk_paths=["/admin", "/login", "/config", "/setup", "/upload"],
        uri_risk_extensions=[r"\.exe", r"\.sql", r"\.cgi", r"\.pl"],
        rules_path="/tmp/graft_parity/rules.yaml",
        webshell_path="/tmp/graft_parity/shells.txt",
    )
    risk._webshell_path = "/tmp/graft_parity/shells.txt"

    df = db.df
    df = risk.balatro(df)
    df = risk.burp_intruder(df)
    df = risk.tool_scanner(df)

    cols = ["source", "timestamp", "ip", "method", "request_uri", "status",
            "resp_size", "user_agent", "referrer", "cluster", "request_count",
            "uri_risk", "method_risk", "status_risk", "risk_score",
            "rule_applied", "tool"]

    def dump(frame, path):
        out = frame[cols].copy()
        out["risk_score"] = out["risk_score"].map(lambda v: f"{float(v):.4f}")
        out = out.astype(str).sort_values(cols).reset_index(drop=True)
        out.to_csv(path, index=False)
        print(f"[ref_golden] wrote {len(out)} rows to {path}")

    dump(df, out_csv)

    # filter-surface parity: a broad conjunctive combo (F1/F2/F5/F6/F7/F10)
    db.from_dataframe(df)
    db.filter(
        start_time="2025-04-21 10:00:00",
        end_time="2025-04-21 12:30:00",
        status_ignore=[302],
        method_ignore=["HEAD"],
        min_size=20,
        all_extension=False,
        extension_ignore=[".js", ".gif", ".css", ".woff", ".woff2", ".ttf",
                          ".svg", ".ico", ".map", ".eot", ".jpg", ".jpeg",
                          ".png", ".bmp", ".webp"],
        ua_ignore=["curl"],
    )
    dump(db.f_df, out_csv.replace(".csv", "_filtered.csv"))

    # F13 tool-focus parity (first/last per (source, ip, tool))
    db.from_dataframe(df)
    db.filter(tools_present=True)
    dump(db.f_df, out_csv.replace(".csv", "_toolfocus.csv"))

    # C11 time-offset parity: rebuild with a -3600s skew correction and
    # dump shifted utc timestamps + cluster ids
    db2 = df_m.AccessLogDataFrame(entries, time_offset=-3600)
    d2 = db2.df.copy()
    d2["utc_str"] = d2["utc_timestamp"].map(
        lambda t: t.strftime("%Y-%m-%d %H:%M:%S+00:00"))
    d2 = d2[["source", "timestamp", "ip", "request_uri", "utc_str",
             "cluster", "request_count"]].astype(str)
    d2 = d2.sort_values(list(d2.columns)).reset_index(drop=True)
    d2.to_csv(out_csv.replace(".csv", "_offset.csv"), index=False)
    print(f"[ref_golden] wrote {len(d2)} rows to offset dump")


if __name__ == "__main__":
    main()
