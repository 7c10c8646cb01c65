"""Summarize a chip-queue log directory into SUMMARY.md + summary.json.

The r4 chip queue (scripts/r4_chip_queue.sh) runs unattended when the relay
probe loop fires it — possibly with no builder session alive — and preserves
raw per-row logs into docs/data/r4_chip/. This turns those raw logs into one
judge-readable table: per queue row, the exit code and every JSON metric
line the row printed (bench.py / validate_mu_dtype.py / long_horizon_drive.py
all emit `{"metric": ...}` lines).

    python scripts/summarize_chip_logs.py /tmp/r4_chip --write
prints the markdown table; --write also drops SUMMARY.md and summary.json
into the directory (the queue's preserve() commits them with the logs).
"""
import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

try:
    from favae_tpu.utils.benchgate import flag_impossible
except ImportError:
    # standalone copy without the package: keep the gate, inline
    def flag_impossible(metric):
        if not isinstance(metric, dict):
            return None
        mfu = metric.get("mfu_pct")
        if isinstance(mfu, (int, float)) and mfu > 100.0:
            return f"mfu_pct={mfu} > 100"
        tflops = metric.get("tflops")
        if isinstance(tflops, (int, float)) and tflops > 197.0:
            return f"tflops={tflops} > v5e bf16 peak 197.0"
        return None

ROW_RE = re.compile(r"^=== (\S+) (start|skip \(done\)|exit=(-?\d+)) (\d\d:\d\d:\d\d)")


def parse_queue_log(path):
    """Return ordered row statuses from queue.log: name -> dict."""
    rows = {}
    if not os.path.exists(path):
        return rows
    with open(path) as f:
        for line in f:
            m = ROW_RE.match(line.strip())
            if not m:
                continue
            name, what, code, ts = m.groups()
            row = rows.setdefault(name, {"name": name})
            if what == "start":
                row["start"] = ts
            elif what.startswith("skip"):
                row.setdefault("status", "skipped (already done)")
            else:
                row["exit"] = int(code)
                row["end"] = ts
    return rows


def parse_metric_lines(path):
    """All parseable {"metric": ...} JSON lines in a row's log."""
    out = []
    if not os.path.exists(path):
        return out
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not (line.startswith("{") and '"metric"' in line):
                continue
            try:
                obj = json.loads(line)
            except ValueError:
                continue
            if isinstance(obj, dict) and "metric" in obj:
                # post-hoc sanity gate (mirrors bench.py's pre-print gate):
                # a line claiming >100% MFU / super-peak TFLOPs is timing
                # garbage — never reformat it into a deadpan table row
                # again (r4 shipped a 1440% MFU SUMMARY.md that way)
                reason = flag_impossible(obj)
                if reason is not None:
                    obj = dict(obj, timing_invalid=reason)
                out.append(obj)
    return out


def _fmt_result(r):
    """One metric dict -> compact human cell."""
    if r.get("timing_invalid"):
        return f"TIMING-INVALID ({r['timing_invalid']}) — do not cite"
    if r.get("error"):
        return f"ERROR: {r['error'][:80]}"
    if "value" in r:
        cell = f"{r['value']} {r.get('unit', '')}".strip()
    elif "samples_per_sec" in r:
        # CAT-bench lines carry samples_per_sec (+pipelined_*) instead of a
        # generic value — r5 SUMMARY.md printed "None" for every CAT row
        cell = f"{r['samples_per_sec']} samples/s"
        if "pipelined_samples_per_sec" in r:
            cell += f" ({r['pipelined_samples_per_sec']} pipelined)"
    elif isinstance(r.get("final"), dict) and "imgs_per_sec" in r["final"]:
        # long_horizon_drive lines: sustained throughput + final loss
        cell = (f"{r['final']['imgs_per_sec']} imgs/s sustained, "
                f"loss_g={r['final'].get('loss_g')}")
    else:
        cell = ""
    extras = []
    for k in ("step_ms", "mfu_pct", "tflops", "pct_of_synthetic",
              "gap_over_noise", "neutral", "final_window_gap",
              "cb_usage_pct_final", "steps", "all_finite"):
        if k in r:
            extras.append(f"{k}={r[k]}")
    if r.get("loader_fed"):
        extras.append(f"loader_fed={r['loader_fed'].get('value')}")
    return cell + (" (" + ", ".join(extras) + ")" if extras else "")


def summarize(log_dir):
    statuses = parse_queue_log(os.path.join(log_dir, "queue.log"))
    rows = []
    for name, st in statuses.items():
        results = parse_metric_lines(os.path.join(log_dir, name + ".log"))
        rows.append({**st, "results": results})
    # Ad-hoc logs: rows run OUTSIDE the queue (builder-driven follow-ups —
    # the r5 remat grid, grad-accum shapes, post-rewrite re-benches) land as
    # plain <name>.log files in the same dir with no queue.log entry. List
    # any that carry metric lines so SUMMARY.md covers the whole directory.
    for fn in sorted(os.listdir(log_dir)):
        if not fn.endswith(".log") or fn == "queue.log":
            continue
        name = fn[:-len(".log")]
        if name in statuses:
            continue
        results = parse_metric_lines(os.path.join(log_dir, fn))
        if results:
            rows.append({"name": name, "status": "ad-hoc (not a queue row)",
                         "results": results})
    return rows


def to_markdown(rows):
    lines = ["# Chip-queue results", "",
             "| row | exit | result |", "|---|---|---|"]
    for r in rows:
        status = (f"{r['exit']}" if "exit" in r
                  else r.get("status") or "RUNNING/CUT")
        if not r["results"]:
            res = "(no metric line)"
        else:
            res = "<br>".join(f"`{x['metric']}`: {_fmt_result(x)}"
                              for x in r["results"])
        lines.append(f"| {r['name']} | {status} | {res} |")
    return "\n".join(lines) + "\n"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("log_dir", nargs="?", default="/tmp/r4_chip")
    ap.add_argument("--write", action="store_true",
                    help="write SUMMARY.md + summary.json into log_dir")
    args = ap.parse_args(argv)

    rows = summarize(args.log_dir)
    md = to_markdown(rows)
    print(md)
    if args.write:
        with open(os.path.join(args.log_dir, "SUMMARY.md"), "w") as f:
            f.write(md)
        with open(os.path.join(args.log_dir, "summary.json"), "w") as f:
            json.dump({"rows": rows}, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
