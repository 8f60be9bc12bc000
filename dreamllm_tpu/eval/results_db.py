"""SQLite eval-results store: models x datasets x runs -> metrics.

TPU-native counterpart of the reference's evaluation database
(omni/eval/language_eval/llama_evaluation_main/llama_evaluation/utils/
db_utils.py: sqlite evaluate_info with model/dataset/metric tables plus
eval_count run versioning; the redis/influx mirrors are intentionally
absent — one file, stdlib only). Used by the eval CLIs to accumulate
scores across runs and print model-vs-model comparisons, replacing the
reference's streamlit display (tools/fe_display.py) with a text table.
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


class ResultsDB:
    """Append-only metric store. One row per (model, dataset, run, metric)."""

    def __init__(self, path: str):
        self.path = path
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
