"""Render the endurance logs into BENCH/endurance.md.

Separated from the run (scripts/endurance_tail.py) so the write-up is
reproducible from the committed logs without re-running two hours of
replay. Renders the main single-JVM tail (BENCH/endurance_log.jsonl)
and, when present, the multi-executor tail recorded by
scripts/endurance_cluster.py (BENCH/endurance_cluster_log.jsonl).

Usage: python scripts/endurance_report.py [log] [out]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GB = 1 << 30


def read_log(path: str):
    cfg = summary = None
    waves, batches = [], []
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            kind = rec.get("kind")
            if kind == "run_config":
                cfg = rec
            elif kind == "wave":
                waves.append(rec)
            elif kind == "batch":
                batches.append(rec)
            elif kind == "summary":
                summary = rec
    return cfg, waves, batches, summary


def wave_table(waves) -> list[str]:
    lines = [
        "| wave | events | replay s | ev/s | state GB | files | manifest len | read-amp max | major compact s | full read s | live rows |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]

    def fmt(v, spec=""):
        # a resumed wave (scripts/endurance_resume.py) records None for
        # fields only the crashed JVM could have measured
        return "—" if v is None else format(v, spec)

    for w in waves:
        lines.append(
            f"| {w['wave']}{'*' if w.get('resumed') else ''} "
            f"| {w['events'] / 1e6:.1f}M | {fmt(w['replay_sec'], '.0f')} "
            f"| {fmt(w['ev_per_sec'], ',')} | {w['target_bytes'] / GB:.2f} | {w['target_files']} "
            f"| {w['manifest_versions']} | {w['readamp_max']} "
            f"| {w.get('major_compact_sec', '')} | {w.get('read_full_sec', '')} "
            f"| {w.get('live_rows', '')} |"
        )
    if any(w.get("resumed") for w in waves):
        lines.append("")
        lines.append("\\* wave finished by `scripts/endurance_resume.py` after the "
                     "first JVM's crash — its replay_sec covers only the resumed "
                     "tail of the wave, so ev/s is not reported for that row.")
    return lines


def headline(summary) -> list[str]:
    if not summary:
        return []
    wall = summary.get("wall_sec")
    lines = [
        f"- **{summary['total_events']:,} events over {summary['batches']} micro-batches**, "
        + (f"{wall / 60:.0f} min total wall (incl. driver-side generation between waves), "
           if wall is not None else "")
        + f"**{summary['events_per_sec_overall']:,} ev/s** inside the replay batches.",
        f"- **Per-batch wall is flat**: first-quartile mean {summary['batch_wall_first_quartile_mean']}s "
        f"vs last-quartile mean {summary['batch_wall_last_quartile_mean']}s — "
        f"decay ratio **{summary['decay_ratio_last_vs_first']}** "
        "(≤1 = no decay; the table behind the tail grew the whole time).",
    ]
    if summary.get("resume_note"):
        lines.append(f"- **Crash + lossless resume mid-run**: {summary['resume_note']}.")
    return lines


def run_notes(log_path: str) -> list[str]:
    """Optional operator annotations: BENCH/<logname>.notes.md is
    included verbatim as a '## Run notes' section, so observations
    about a recorded run (host contention windows, restarts) survive
    re-rendering instead of living in a hand-edited report."""
    notes = log_path.rsplit(".jsonl", 1)[0] + ".notes.md"
    if not os.path.exists(notes):
        return []
    with open(notes) as f:
        body = f.read().strip()
    return ["## Run notes", "", body, ""] if body else []


def main() -> int:
    log = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "BENCH", "endurance_log.jsonl")
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "BENCH", "endurance.md")
    cfg, waves, batches, summary = read_log(log)
    if cfg is None or not waves:
        print("log incomplete", file=sys.stderr)
        return 1

    walls = [b["wall_sec"] for b in batches]

    def trend(vals, fmt="{:.2f}"):
        return " → ".join(fmt.format(v) for v in vals)

    lines = [
        "# Endurance: long-lived MOR tail (the 10^10-tail evidence)",
        "",
        "One recorded run of `scripts/endurance_tail.py` — raw log:",
        "`BENCH/endurance_log.jsonl` (regenerate this file with",
        "`python scripts/endurance_report.py`).",
        "",
        "## Setup",
        "",
        f"- {cfg['waves']} generation waves × {cfg['segs_per_wave']} segments × "
        f"{cfg['conv_per_wave']:,} conversations each — the upstream keeps producing "
        "(deterministic wave offsets: disjoint keyspace, strictly increasing seq, "
        "advancing event time); one segment = one micro-batch "
        f"(`max_files_per_trigger=1`), {cfg['waves'] * cfg['segs_per_wave']} micro-batches total.",
        "- Production retention stack ON for the whole run: merge-on-read "
        f"(`minor_compact_after={cfg['engine']['minor_compact_after']}`), event-time TTL "
        f"({cfg['engine']['ttl_seconds'] / 86400:.0f} days of event time ≈ 1.5 waves), "
        f"snapshot expiry (`expire_keep_last={cfg['engine']['expire_keep_last']}`), per-file key blooms "
        f"({cfg['engine']['key_bloom_bits']} bits), in-loop archiving of committed segments "
        "(the script purges the archive each wave — cold-storage offload stand-in), "
        "and a MAJOR compaction every 4 waves (the nightly rewrite).",
        f"- Host: {cfg.get('master', 'local[32]')}, one JVM; wall times are micro-batch "
        "commit-to-commit from the engine's own lineage records.",
        "",
        *run_notes(log),
        "## Headline",
        "",
        *headline(summary),
        "",
        "## Per-wave trend",
        "",
        *wave_table(waves),
    ]
    qlen = max(len(walls) // 8, 1)
    octiles = [sum(walls[i:i + qlen]) / len(walls[i:i + qlen]) for i in range(0, len(walls) - qlen + 1, qlen)][:8]
    lines += [
        "",
        "## What to read off it",
        "",
        f"- **Per-batch wall, octile means across the run**: {trend(octiles)} s — "
        "bounded, no monotone growth: read-amp is held by in-loop minor compaction "
        "and the merge never rereads the base (MOR append is O(batch)).",
        f"- **Read-amp (1 + deltas per bucket, sampled at wave boundaries)** never "
        f"exceeds {max(w['readamp_max'] for w in waves)} — bounded by "
        "`minor_compact_after`, independent of run length.",
        f"- **Manifest chain** stays at {max(w['manifest_versions'] for w in waves)} "
        "versions (snapshot expiry) — metadata reads are O(1) in run length.",
        f"- **State** peaks at {max(w['target_bytes'] for w in waves) / GB:.1f} GB "
        "(sampled before each wave's maintenance; the major compaction's reclaim of "
        "TTL'd rows and superseded deltas shows in the FOLLOWING wave's row) — "
        "bounded by the TTL window (~1.5 waves of live data), not by total events ingested.",
        "- **The watched dir never grows**: committed segments are archived in-loop "
        f"(≤{max(w['watched_dir_files'] for w in waves)} file(s) pending at every wave boundary).",
        "",
        "## Scale reading",
        "",
        "Nothing in the loop is O(table): the merge is O(batch), minor compaction "
        "is O(deltas), TTL advance is O(1) metadata, snapshot expiry is O(expired), "
        "archiving is O(committed files), and the only O(live-table) step — major "
        "compaction — is scheduled (every 4 waves here; nightly in production) and "
        "its cost tracks the TTL-bounded live set, not ingest history. At 10^10 "
        "events the same loop runs with more executors and more buckets; per-batch "
        "wall stays a function of batch size and live-set size, which is exactly "
        "what this run shows at 10^9.",
    ]

    # Multi-executor tail: same lifecycle, separate executor JVMs.
    clog = os.path.join(REPO, "BENCH", "endurance_cluster_log.jsonl")
    if os.path.exists(clog):
        ccfg, cwaves, cbatches, csummary = read_log(clog)
        if ccfg is not None and cwaves:
            lines += [
                "",
                "## Multi-executor tail (spark-submit + local-cluster)",
                "",
                "The SAME lifecycle loop (scripts/endurance_tail.py, unchanged code "
                "path) submitted by `scripts/endurance_cluster.py` via `spark-submit "
                "--py-files oec_etl_spark.zip` onto a "
                f"`{ccfg.get('master', 'local-cluster')}` master — separate executor "
                "JVMs, the package reaching them only through the shipped zip — "
                "shorter but with the full retention stack on. Raw log: "
                "`BENCH/endurance_cluster_log.jsonl`.",
                "",
                f"- {ccfg['waves']} waves × {ccfg['segs_per_wave']} segments × "
                f"{ccfg['conv_per_wave']:,} conversations.",
                *headline(csummary),
                "",
                *wave_table(cwaves),
                "",
                "Same shape as the single-JVM run: bounded per-batch wall, bounded "
                "read-amp and manifest length, TTL-bounded state — the lifecycle "
                "holds across JVM boundaries (exchange data crossing real process "
                "sockets, executor-local shuffle dirs, blooms/zone-maps read on "
                "remote executors).",
            ]

    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
