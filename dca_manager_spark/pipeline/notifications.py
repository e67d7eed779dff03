"""Run-outcome notifications: the SNS success/failure-topic seam.

Reference parity: every reference lambda publishes its invocation
outcome to one of two SNS topics with email subscriptions — success to
``dca-lambda-sucess`` [sic], failure to ``dca-lambda-failure-dlq``
(terraform/aws_sns.tf:1-26, wired as lambda destinations). The engine
mirrors the CONTRACT — two topics, outcome-routed, fire-and-forget
(a broken notification channel must never fail the run it reports on)
— behind a small protocol so deployments swap in boto3 SNS without
touching pipeline code.

Implementations:
- ``ListTopic``: in-memory, for tests and interactive sessions;
- ``FileTopic``: durable JSON-lines append under flock (two concurrent
  publishers never interleave a line) — the local stand-in for a topic,
  and a Structured-Streaming-readable one: point a file stream at the
  directory and the success/failure feed becomes a queryable table;
- ``CallableTopic``: adapter for anything else (boto3 publish, webhook).

``RunNotifier`` routes ScheduleRunner firing records (status "ok" ->
success topic, everything else -> failure topic, matching the lambda
destination split) and exposes ``notify_run`` for wrapping arbitrary
batch entry points.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable, Protocol


class NotificationTopic(Protocol):
    def publish(self, subject: str, message: dict[str, Any]) -> None: ...


@dataclass
class ListTopic:
    name: str = "topic"
    messages: list[tuple[str, dict[str, Any]]] = field(default_factory=list)

    def publish(self, subject: str, message: dict[str, Any]) -> None:
        self.messages.append((subject, message))


@dataclass
class FileTopic:
    """Append-only JSONL topic. One line per publish, written atomically
    under an advisory flock (concurrent publishers from the scheduler
    and a pipeline job must not interleave bytes)."""

    path: str
    name: str = "topic"

    def publish(self, subject: str, message: dict[str, Any]) -> None:
        import fcntl

        p = Path(self.path)
        p.parent.mkdir(parents=True, exist_ok=True)
        line = json.dumps(
            {"subject": subject, "message": message}, sort_keys=True,
            default=str,
        )
        with open(p, "a") as fh:
            fcntl.flock(fh, fcntl.LOCK_EX)
            fh.write(line + "\n")
            fh.flush()


@dataclass
class CallableTopic:
    fn: Callable[[str, dict[str, Any]], Any]
    name: str = "topic"

    def publish(self, subject: str, message: dict[str, Any]) -> None:
        self.fn(subject, message)


@dataclass
class RunNotifier:
    """Outcome router. ``success``/``failure`` mirror the reference's
    two SNS topics; publish errors are swallowed after recording
    (``publish_errors``) — notifications are observability, and a dead
    channel must never turn a succeeded run into a failed one."""

    success: NotificationTopic
    failure: NotificationTopic
    publish_errors: list[str] = field(default_factory=list)

    def notify(self, record: dict[str, Any]) -> None:
        ok = record.get("status") == "ok"
        topic = self.success if ok else self.failure
        subject = (
            f"dca-manager-spark: {record.get('operation', 'run')} "
            f"{'succeeded' if ok else 'FAILED'}"
        )
        try:
            topic.publish(subject, dict(record))
        except Exception as exc:  # fire-and-forget, loud in-process
            self.publish_errors.append(repr(exc))

    def notify_run(
        self, operation: str, fn: Callable[[], Any]
    ) -> Any:
        """Wrap a batch entry point (execute_orders, process_orders,
        a backfill): publish success with the result summary or failure
        with the exception, then re-raise — the notification reports
        the outcome, it never changes it."""
        try:
            result = fn()
        except Exception as exc:
            self.notify(
                {
                    "operation": operation,
                    "status": "error",
                    "error": repr(exc),
                }
            )
            raise
        self.notify(
            {"operation": operation, "status": "ok", "result": result}
        )
        return result
