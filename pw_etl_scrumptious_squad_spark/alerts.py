"""Alerting seam over observed metrics — the engine-side analogue of the
reference's CloudWatch-alarm -> SNS-topic wiring
(``/root/reference/terraform/alarm.tf:17-76``,
``terraform/messaging.tf``): the reference pages a human when a Lambda
errors or overruns; this module pages (via a pluggable sink) when a
DECLARED THRESHOLD over the pipeline's own data-quality counters is
violated.

Division of labor: ``operators/dq.py`` MEASURES (Observation /
CollectMetrics counters ride the load action for free; the exact checks
are second-pass probes), this module DECIDES AND NOTIFIES. Thresholds
are declarative specs over a plain ``{metric: value}`` dict, so the same
specs evaluate against batch Observation results, streaming-monitor
rows, or any dict a caller assembles.

Sinks are callables ``Alert -> None``. In-sandbox sinks: ``log_sink``
(python logging) and ``file_sink`` (append-a-JSON-line — the artifact a
test or an operator tails). In a real deployment the sink body is the
one place that changes: an SNS publish (``boto3.client("sns").publish``
to the error topic, exactly what the reference's alarm actions target),
a Slack webhook, or PagerDuty — the evaluation semantics stay identical.
No cloud SDK ships in this sandbox, so no such sink is imported here.

Each ``AlertManager.evaluate`` call fires the sink EXACTLY ONCE per
violated threshold (per batch, in the ETL wiring) — alert storms are the
caller's dedup problem only across batches, never within one.
"""

from __future__ import annotations

import json
import logging
import numbers
import operator
from collections.abc import Callable, Iterable
from dataclasses import dataclass

_OPS: dict[str, Callable] = {
    ">": operator.gt,
    ">=": operator.ge,
    "<": operator.lt,
    "<=": operator.le,
    "==": operator.eq,
    "!=": operator.ne,
}


@dataclass(frozen=True)
class Threshold:
    """Declarative alert spec: fire when ``<metric> <op> <value>`` holds
    over an observed-metrics dict. ``missing`` controls semantics when
    the metric is absent: 'ignore' (default — the counter simply wasn't
    observed this batch) or 'alert' (absence itself is the failure,
    e.g. a heartbeat)."""

    metric: str
    op: str
    value: float
    severity: str = "error"
    missing: str = "ignore"

    def __post_init__(self):
        if self.op not in _OPS:
            raise ValueError(f"unknown op {self.op!r}; use one of {sorted(_OPS)}")
        if self.missing not in ("ignore", "alert"):
            raise ValueError("missing must be 'ignore' or 'alert'")

    def violated_by(self, metrics: dict) -> bool:
        if self.metric not in metrics or metrics[self.metric] is None:
            return self.missing == "alert"
        got = metrics[self.metric]
        if not isinstance(got, numbers.Number):
            raise TypeError(
                f"metric {self.metric!r} is {type(got).__name__}, not numeric"
            )
        return bool(_OPS[self.op](got, self.value))


@dataclass(frozen=True)
class Alert:
    """One fired threshold: everything a pager/runbook needs inline."""

    context: str
    metric: str
    observed: float | None
    op: str
    threshold: float
    severity: str

    def message(self) -> str:
        return (
            f"[{self.severity}] {self.context}: {self.metric}="
            f"{self.observed} violates ({self.metric} {self.op} "
            f"{self.threshold})"
        )


def log_sink(alert: Alert, _logger=logging.getLogger("pw_etl.alerts")) -> None:
    """Default sink: python logging at ERROR/WARNING per severity."""
    level = logging.ERROR if alert.severity == "error" else logging.WARNING
    _logger.log(level, "%s", alert.message())


def file_sink(path: str) -> Callable[[Alert], None]:
    """Append one JSON line per alert to ``path`` — the in-sandbox
    stand-in for an SNS publish (see module docstring), and the artifact
    an operator (or a test) tails."""

    def sink(alert: Alert) -> None:
        with open(path, "a") as fh:
            fh.write(
                json.dumps(
                    {
                        "context": alert.context,
                        "metric": alert.metric,
                        "observed": alert.observed,
                        "op": alert.op,
                        "threshold": alert.threshold,
                        "severity": alert.severity,
                    }
                )
                + "\n"
            )

    return sink


class AlertManager:
    """Evaluate a fixed set of :class:`Threshold` specs against observed
    metrics; fire ``sink`` exactly once per violated spec per call.

    Returns the fired :class:`Alert` list so callers can ALSO gate
    control flow (quarantine a batch, stop a stream) on the same specs
    that page — one source of truth for "what is wrong"."""

    def __init__(
        self,
        thresholds: Iterable[Threshold],
        sink: Callable[[Alert], None] = log_sink,
    ) -> None:
        self.thresholds = list(thresholds)
        names = [
            (t.metric, t.op, t.value, t.severity) for t in self.thresholds
        ]
        if len(set(names)) != len(names):
            raise ValueError("duplicate threshold specs")
        self.sink = sink

    def evaluate(self, metrics: dict, context: str = "") -> list[Alert]:
        fired = []
        for t in self.thresholds:
            if t.violated_by(metrics):
                a = Alert(
                    context=context,
                    metric=t.metric,
                    observed=metrics.get(t.metric),
                    op=t.op,
                    threshold=t.value,
                    severity=t.severity,
                )
                self.sink(a)
                fired.append(a)
        return fired
