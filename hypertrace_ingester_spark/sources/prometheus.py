"""Prometheus text-exposition export — S6 operational-metrics analog.

The reference registers counters/gauges with its service framework and a
Prometheus servlet scrapes them (metric names like
``hypertrace.ingestion.*``). A batch/micro-batch Spark job has no
long-lived servlet, so the equivalent contract is the Prometheus
TEXTFILE-collector format (the documented node_exporter integration
path): each run writes ``metrics.prom`` in the standard text exposition
format (https://prometheus.io/docs/instrumenting/exposition_formats/) and
the collector scrapes the directory. Same metric names/labels a scrape of
the reference yields, different transport — push-per-run instead of pull.
"""

from __future__ import annotations

import os


def _escape(value: str) -> str:
    """Label-value escaping per the exposition format: backslash, quote,
    newline."""
    return value.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


def _fmt_labels(labels: dict[str, str]) -> str:
    if not labels:
        return ""
    inner = ",".join(f'{k}="{_escape(str(v))}"' for k, v in sorted(labels.items()))
    return "{" + inner + "}"


def render_exposition(metrics: list[tuple[str, dict[str, str], float]],
                      help_text: dict[str, str] | None = None,
                      types: dict[str, str] | None = None) -> str:
    """(name, labels, value) triples → Prometheus text exposition format.

    Families are grouped with one ``# HELP``/``# TYPE`` header each;
    ``types`` maps family → counter|gauge (default counter — rate() over a
    family mislabeled counter produces nonsense on every faster run, so
    durations MUST be declared gauges)."""
    help_text = help_text or {}
    types = types or {}
    by_family: dict[str, list[str]] = {}
    for name, labels, value in metrics:
        line = f"{name}{_fmt_labels(labels)} {value:g}"
        by_family.setdefault(name, []).append(line)
    out = []
    for name in sorted(by_family):
        out.append(f"# HELP {name} {help_text.get(name, name)}")
        out.append(f"# TYPE {name} {types.get(name, 'counter')}")
        out.extend(by_family[name])
    return "\n".join(out) + "\n"


def write_pipeline_metrics(out_dir: str, manifest: dict) -> str:
    """Flatten a pipeline manifest into ``<out_dir>/metrics.prom``."""
    triples: list[tuple[str, dict[str, str], float]] = []
    for sink, n in manifest["stages"]["route"].get("sink_counts", {}).items():
        triples.append(("ingester_routed_rows_total", {"sink": sink}, float(n)))
    for row in manifest.get("tenant_counters", []):
        labels = {"tenant_id": str(row.get("tenant_id"))}
        for key, val in row.items():
            if key != "tenant_id" and isinstance(val, (int, float)):
                triples.append((f"ingester_{key}_total", labels, float(val)))
    triples.append(
        ("ingester_run_seconds", {}, float(manifest.get("elapsed_sec", 0.0)))
    )
    text = render_exposition(
        triples,
        help_text={
            "ingester_routed_rows_total": "rows routed per sink this run",
            "ingester_run_seconds": "wall seconds for the pipeline run",
        },
        types={"ingester_run_seconds": "gauge"},
    )
    path = os.path.join(out_dir, "metrics.prom")
    with open(path, "w") as fh:
        fh.write(text)
    return path


def write_curation_metrics(out_dir: str, manifest: dict) -> str:
    """Flatten a curation-run manifest (plans/curation.py) into
    ``<out_dir>/metrics.prom`` — same textfile-collector contract as the
    span pipeline's exporter, so one scrape config covers both faces."""
    triples: list[tuple[str, dict[str, str], float]] = []
    for stage, rec in manifest.get("stages", {}).items():
        labels = {"stage": stage}
        triples.append(("curation_stage_rows", labels, float(rec["rows"])))
        triples.append(("curation_stage_tokens", labels, float(rec["tokens"])))
    for key, val in manifest.get("corpus_dedup", {}).items():
        if isinstance(val, (int, float)):
            triples.append((f"curation_corpus_{key}_total", {}, float(val)))
    for split, n in manifest.get("split_counts", {}).items():
        triples.append(("curation_split_rows", {"split": split}, float(n)))
    triples.append(
        ("curation_run_seconds", {}, float(manifest.get("elapsed_sec", 0.0)))
    )
    text = render_exposition(
        triples,
        help_text={
            "curation_stage_rows": "docs surviving each curation stage",
            "curation_stage_tokens": "tokens surviving each curation stage",
            "curation_run_seconds": "wall seconds for the curation run",
        },
        types={
            "curation_stage_rows": "gauge",
            "curation_stage_tokens": "gauge",
            "curation_run_seconds": "gauge",
        },
    )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "metrics.prom")
    with open(path, "w") as fh:
        fh.write(text)
    return path
