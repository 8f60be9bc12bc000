"""SQLite eval-results store: models x datasets x runs -> metrics.

TPU-native counterpart of the reference's evaluation database
(omni/eval/language_eval/llama_evaluation_main/llama_evaluation/utils/
db_utils.py: sqlite evaluate_info with model/dataset/metric tables plus
eval_count run versioning). The reference's cluster mirrors (redis_init/
influxdb writers, db_utils.py) map to :class:`MetricsMirror` push targets —
a JSONL mirror that always works, plus redis/influx mirrors that activate
when those client libraries exist (they are not baked into this image and
are NOT required: the sqlite store is the source of truth). The streamlit
display (tools/fe_display.py) maps to :func:`export_dashboard_html` — a
static, dependency-free HTML dashboard — alongside the text leaderboard
(:meth:`ResultsDB.compare`).
"""

from __future__ import annotations

import json
import os
import sqlite3
import time
from typing import Mapping, Sequence

_SCHEMA = """
CREATE TABLE IF NOT EXISTS models (
    id INTEGER PRIMARY KEY AUTOINCREMENT,
    name TEXT UNIQUE NOT NULL,
    path TEXT DEFAULT '',
    created REAL NOT NULL
);
CREATE TABLE IF NOT EXISTS evaluations (
    id INTEGER PRIMARY KEY AUTOINCREMENT,
    model_id INTEGER NOT NULL REFERENCES models(id),
    dataset TEXT NOT NULL,
    eval_count INTEGER NOT NULL,
    metric TEXT NOT NULL,
    value REAL NOT NULL,
    n INTEGER DEFAULT 0,
    extra TEXT DEFAULT '',
    created REAL NOT NULL
);
CREATE INDEX IF NOT EXISTS idx_eval_model ON evaluations(model_id, dataset);
"""


class MetricsMirror:
    """Push target for recorded rows (reference redis/influx writers,
    db_utils.py). ``push`` receives one flat dict per recorded run."""

    def push(self, row: Mapping) -> None:  # pragma: no cover - interface
        raise NotImplementedError


class JsonlMirror(MetricsMirror):
    """Append each recorded run to a JSONL file — the always-available
    mirror (a shared filesystem plays the reference's redis role here)."""

    def __init__(self, path: str):
        self.path = path
        if os.path.dirname(path):
            os.makedirs(os.path.dirname(path), exist_ok=True)

    def push(self, row: Mapping) -> None:
        with open(self.path, "a") as fh:
            fh.write(json.dumps(dict(row)) + "\n")


class RedisMirror(MetricsMirror):
    """reference redis_init/db_utils redis writer — requires the ``redis``
    client (not baked into this image; constructing without it raises)."""

    def __init__(self, url: str = "redis://localhost:6379/0", prefix: str = "dreamllm"):
        import redis  # not in this image; activates on clusters that have it

        self.r = redis.Redis.from_url(url)
        self.prefix = prefix

    def push(self, row: Mapping) -> None:
        key = f"{self.prefix}:{row['model']}:{row['dataset']}:{row['eval_count']}"
        self.r.set(key, json.dumps(dict(row)))


class InfluxMirror(MetricsMirror):
    """reference influxdb writer — requires ``influxdb-client``."""

    def __init__(self, url: str, token: str, org: str, bucket: str):
        from influxdb_client import InfluxDBClient  # optional, like redis

        self.client = InfluxDBClient(url=url, token=token, org=org)
        self.bucket = bucket
        self.org = org

    def push(self, row: Mapping) -> None:
        from influxdb_client import Point

        p = Point("evaluation").tag("model", row["model"]).tag("dataset", row["dataset"])
        for k, v in row.get("metrics", {}).items():
            p = p.field(k, float(v))
        self.client.write_api().write(bucket=self.bucket, org=self.org, record=p)


class ResultsDB:
    """Append-only metric store. One row per (model, dataset, run, metric).

    ``mirrors``: optional push targets receiving one flat dict per recorded
    run (model/dataset/eval_count/metrics/n/time) — mirror failures are
    logged to stderr and never fail the record (the reference swallows its
    redis errors the same way)."""

    def __init__(self, path: str, mirrors: Sequence[MetricsMirror] = ()):
        self.path = path
        self.mirrors = list(mirrors)
        if os.path.dirname(path):
            os.makedirs(os.path.dirname(path), exist_ok=True)
        self.conn = sqlite3.connect(path)
        self.conn.executescript(_SCHEMA)
        self.conn.commit()

    def close(self) -> None:
        self.conn.close()

    def __enter__(self) -> "ResultsDB":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def find_model_id(self, name: str) -> int | None:
        """Read-only lookup — queries must not mutate the store."""
        row = self.conn.execute(
            "SELECT id FROM models WHERE name = ?", (name,)
        ).fetchone()
        return int(row[0]) if row else None

    def model_id(self, name: str, path: str = "") -> int:
        """Get-or-create (reference ensure_model_info_exist)."""
        mid = self.find_model_id(name)
        if mid is not None:
            return mid
        cur = self.conn.execute(
            "INSERT INTO models (name, path, created) VALUES (?, ?, ?)",
            (name, path, time.time()),
        )
        self.conn.commit()
        return int(cur.lastrowid)

    def next_eval_count(self, model: str, dataset: str) -> int:
        """Next run index for this model/dataset (reference get_max_eval_count+1)."""
        mid = self.model_id(model)
        row = self.conn.execute(
            "SELECT MAX(eval_count) FROM evaluations WHERE model_id = ? AND dataset = ?",
            (mid, dataset),
        ).fetchone()
        return int(row[0] or 0) + 1

    def record(
        self,
        model: str,
        dataset: str,
        metrics: Mapping[str, float],
        *,
        n: int = 0,
        extra: Mapping | None = None,
        eval_count: int | None = None,
    ) -> int:
        """Store a run's scalar metrics; returns the run's eval_count."""
        mid = self.model_id(model)
        # `is None`, not truthiness: an explicit eval_count=0 must be honored
        count = eval_count if eval_count is not None else self.next_eval_count(model, dataset)
        now = time.time()
        payload = json.dumps(dict(extra)) if extra else ""
        rows = [
            (mid, dataset, count, k, float(v), n, payload, now)
            for k, v in metrics.items()
            if isinstance(v, (int, float))
        ]
        self.conn.executemany(
            "INSERT INTO evaluations (model_id, dataset, eval_count, metric, "
            "value, n, extra, created) VALUES (?, ?, ?, ?, ?, ?, ?, ?)",
            rows,
        )
        self.conn.commit()
        flat = {
            "model": model, "dataset": dataset, "eval_count": count,
            "metrics": {k: float(v) for k, v in metrics.items()
                        if isinstance(v, (int, float))},
            "n": n, "time": now,
        }
        for m in self.mirrors:
            try:
                m.push(flat)
            except Exception as e:  # mirror down ≠ lost result
                import sys

                print(f"results mirror {type(m).__name__} failed: {e}",
                      file=sys.stderr)
        return count

    def record_result(self, model: str, result: Mapping) -> int:
        """Store a task driver's output dict (task/accuracy/n + flat extras)."""
        dataset = str(result.get("task", "unknown"))
        metrics = {
            k: v for k, v in result.items()
            if isinstance(v, (int, float)) and k not in ("n",)
        }
        for group in ("by_subject", "by_task", "by_level", "by_type"):
            for k, v in (result.get(group) or {}).items():
                metrics[f"{group[3:]}/{k}"] = v
        return self.record(model, dataset, metrics, n=int(result.get("n", 0)))

    def latest(self, model: str, dataset: str) -> dict[str, float]:
        """Metrics of the newest run for model/dataset (read-only: an
        unknown model returns {} instead of being created by the lookup)."""
        mid = self.find_model_id(model)
        if mid is None:
            return {}
        rows = self.conn.execute(
            "SELECT metric, value FROM evaluations WHERE model_id = ? AND "
            "dataset = ? AND eval_count = (SELECT MAX(eval_count) FROM "
            "evaluations WHERE model_id = ? AND dataset = ?)",
            (mid, dataset, mid, dataset),
        ).fetchall()
        return {k: v for k, v in rows}

    def history(self, model: str, dataset: str, metric: str = "accuracy") -> list[tuple[int, float]]:
        mid = self.find_model_id(model)
        if mid is None:
            return []
        rows = self.conn.execute(
            "SELECT eval_count, value FROM evaluations WHERE model_id = ? AND "
            "dataset = ? AND metric = ? ORDER BY eval_count",
            (mid, dataset, metric),
        ).fetchall()
        return [(int(c), float(v)) for c, v in rows]

    def compare(
        self, datasets: Sequence[str] | None = None, metric: str = "accuracy"
    ) -> str:
        """Text leaderboard: one row per model, one column per dataset."""
        names = [r[0] for r in self.conn.execute("SELECT name FROM models ORDER BY id")]
        if datasets is None:
            datasets = [
                r[0] for r in self.conn.execute(
                    "SELECT DISTINCT dataset FROM evaluations ORDER BY dataset"
                )
            ]
        width = max([len(n) for n in names] + [5])
        header = "model".ljust(width) + "".join(f"  {d:>12}" for d in datasets)
        lines = [header, "-" * len(header)]
        for name in names:
            cells = []
            for d in datasets:
                val = self.latest(name, d).get(metric)
                cells.append(f"  {val:>12.4f}" if val is not None else f"  {'-':>12}")
            lines.append(name.ljust(width) + "".join(cells))
        return "\n".join(lines)


def export_dashboard_html(db: "ResultsDB", out_path: str, metric: str = "accuracy") -> str:
    """Static HTML dashboard (leaderboard + per-run history per cell) —
    zero-dependency counterpart of the reference's streamlit display
    (tools/fe_display.py). Open the file in any browser; nothing to serve."""
    import html as _html

    names = [r[0] for r in db.conn.execute("SELECT name FROM models ORDER BY id")]
    datasets = [
        r[0] for r in db.conn.execute(
            "SELECT DISTINCT dataset FROM evaluations ORDER BY dataset"
        )
    ]
    rows = []
    for name in names:
        cells = []
        for d in datasets:
            hist = db.history(name, d, metric)
            if not hist:
                cells.append("<td class='na'>–</td>")
                continue
            latest = hist[-1][1]
            trend = " → ".join(f"{v:.4g}" for _, v in hist[-5:])
            cells.append(
                f"<td><b>{latest:.4f}</b><br><span class='hist'>{_html.escape(trend)}"
                f"</span></td>"
            )
        rows.append(f"<tr><th>{_html.escape(name)}</th>{''.join(cells)}</tr>")
    head = "".join(f"<th>{_html.escape(d)}</th>" for d in datasets)
    doc = f"""<!doctype html><meta charset="utf-8">
<title>dreamllm_tpu eval results</title>
<style>
body {{ font: 14px/1.5 system-ui, sans-serif; margin: 2rem; color: #1a1a1a; }}
table {{ border-collapse: collapse; }}
th, td {{ border: 1px solid #d0d0d0; padding: .4rem .8rem; text-align: right; }}
thead th, tbody th {{ background: #f4f4f4; text-align: left; }}
.hist {{ color: #777; font-size: 11px; }}
.na {{ color: #bbb; text-align: center; }}
caption {{ text-align: left; font-weight: 600; margin-bottom: .5rem; }}
</style>
<table>
<caption>latest {_html.escape(metric)} per model × dataset (last 5 runs shown under each)</caption>
<thead><tr><th>model</th>{head}</tr></thead>
<tbody>{''.join(rows)}</tbody>
</table>
"""
    if os.path.dirname(out_path):
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as fh:
        fh.write(doc)
    return out_path
