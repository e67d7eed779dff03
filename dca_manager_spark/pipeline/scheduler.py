"""EP1 trigger orchestration: cron schedules for execute-orders.

Reference parity: EP1's entry point is not a long-running service — it is
a set of EventBridge cron rules (terraform/aws_lambda_execute_orders.tf:
138-146) whose default expressions live in terraform/variables.tf:10-20
("cron(0 6 ? * FRI *)", "cron(45 19 ? * WED *)"), each firing the lambda
with the payload {"operation": "ExecuteOrders"}, zero retries, and a
60-second maximum event age. This module reproduces that contract:

- ``CronSchedule`` parses the AWS 6-field cron subset the reference uses
  (minute hour day-of-month month day-of-week year; ``?``/``*``, lists,
  ranges, ``*/step``, and day/month names) and computes UTC fire times.
- ``ScheduleRunner`` holds (schedule, operation) rules and fires a
  dispatch callable for every rule due in a time window — at most once
  per rule per distinct fire time, no retry on failure (retry_policy
  maximum_retry_attempts = 0), and a firing older than ``max_event_age``
  when observed is DROPPED, not run late (maximum_event_age_in_seconds).

Deployment recipes (no resident scheduler required):
- cron/systemd-timer: run ``python -m dca_manager_spark.pipeline.cli
  execute-orders ...`` directly at the schedule — the job is batch and
  idempotent per (config, transaction id).
- Structured Streaming: trigger the downstream EP2 consumer with
  ``Trigger.AvailableNow`` after each EP1 firing; the queue-ack
  checkpoint (streaming/queue_source.py) makes re-fires exactly-once.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field
from typing import Any, Callable

_DOW_NAMES = {"SUN": 1, "MON": 2, "TUE": 3, "WED": 4, "THU": 5, "FRI": 6, "SAT": 7}
_MON_NAMES = {
    "JAN": 1, "FEB": 2, "MAR": 3, "APR": 4, "MAY": 5, "JUN": 6,
    "JUL": 7, "AUG": 8, "SEP": 9, "OCT": 10, "NOV": 11, "DEC": 12,
}


def _parse_field(spec: str, lo: int, hi: int, names: dict[str, int] | None = None) -> set[int]:
    """One cron field -> the set of matching values. Supports ``*``/``?``,
    comma lists, ``a-b`` ranges, ``*/n`` and ``a/n`` steps, and names."""
    def atom(s: str) -> int:
        s = s.strip().upper()
        if names and s in names:
            return names[s]
        v = int(s)
        if not lo <= v <= hi:
            raise ValueError(f"cron field value {v} outside [{lo}, {hi}]")
        return v

    spec = spec.strip()
    if spec in ("*", "?"):
        return set(range(lo, hi + 1))
    out: set[int] = set()
    for part in spec.split(","):
        if "/" in part:
            base, step_s = part.split("/", 1)
            step = int(step_s)
            start = lo if base in ("*", "") else atom(base)
            out.update(range(start, hi + 1, step))
        elif "-" in part and not part.lstrip("-").isdigit():
            a, b = part.split("-", 1)
            out.update(range(atom(a), atom(b) + 1))
        else:
            out.add(atom(part))
    return out


@dataclass(frozen=True)
class CronSchedule:
    """An AWS-style 6-field cron expression, evaluated in UTC.

    ``cron(Minutes Hours Day-of-month Month Day-of-week Year)`` — AWS
    day-of-week is 1-7 = SUN-SAT. Exactly one of day-of-month /
    day-of-week should be ``?`` (both-``*`` is accepted and means every
    day, matching the common-case reading).
    """

    expression: str
    description: str = ""

    def _fields(self):
        body = self.expression.strip()
        if body.lower().startswith("cron(") and body.endswith(")"):
            body = body[5:-1]
        parts = body.split()
        if len(parts) == 5:  # classic 5-field cron: treat year as *
            parts.append("*")
        if len(parts) != 6:
            raise ValueError(f"cron expression needs 5 or 6 fields: {self.expression!r}")
        minute, hour, dom, month, dow, year = parts
        return (
            _parse_field(minute, 0, 59),
            _parse_field(hour, 0, 23),
            _parse_field(dom, 1, 31),
            _parse_field(month, 1, 12, _MON_NAMES),
            _parse_field(dow, 1, 7, _DOW_NAMES),
            _parse_field(year, 1970, 2199),
            dom.strip() in ("*", "?"),
            dow.strip() in ("*", "?"),
        )

    def matches(self, when: dt.datetime) -> bool:
        minutes, hours, doms, months, dows, years, dom_any, dow_any = self._fields()
        aws_dow = when.isoweekday() % 7 + 1  # Mon=1..Sun=7 -> SUN=1..SAT=7
        if when.minute not in minutes or when.hour not in hours:
            return False
        if when.month not in months or when.year not in years:
            return False
        # AWS semantics: restrict on whichever of dom/dow is specified.
        dom_ok = when.day in doms
        dow_ok = aws_dow in dows
        if dom_any and dow_any:
            return True
        if dom_any:
            return dow_ok
        if dow_any:
            return dom_ok
        return dom_ok and dow_ok

    def next_fire(self, after: dt.datetime) -> dt.datetime | None:
        """First fire time strictly after ``after`` (UTC), or None within
        a 5-year search horizon. Minute resolution, like EventBridge."""
        t = after.replace(second=0, microsecond=0) + dt.timedelta(minutes=1)
        horizon = after + dt.timedelta(days=5 * 366)
        while t <= horizon:
            if self.matches(t):
                return t
            t += dt.timedelta(minutes=1)
        return None

    def fires_between(self, start: dt.datetime, end: dt.datetime) -> list[dt.datetime]:
        """All fire times in (start, end]."""
        out = []
        t = self.next_fire(start)
        while t is not None and t <= end:
            out.append(t)
            t = self.next_fire(t)
        return out


# The reference's default schedules (terraform/variables.tf:10-20).
DEFAULT_EXECUTE_ORDERS_SCHEDULES = (
    CronSchedule("cron(0 6 ? * FRI *)", "At 6:00 UTC on every Friday"),
    CronSchedule("cron(45 19 ? * WED *)", "At 19:45 UTC on every Wednesday"),
)


@dataclass
class ScheduleRule:
    schedule: CronSchedule
    operation: str = "ExecuteOrders"  # input_transformer payload


@dataclass
class ScheduleRunner:
    """Fires due rules against an operation dispatch table.

    ``dispatch`` maps operation name -> zero-arg callable (the lambda
    handler switch on {"operation": ...}). ``run_due(now)`` fires every
    rule whose schedule matched since the last call: no retries (a raising
    handler records the failure and moves on — retry_policy 0), and fire
    times older than ``max_event_age`` at observation are dropped as the
    EventBridge target would drop them (maximum_event_age_in_seconds=60).
    """

    rules: list[ScheduleRule]
    dispatch: dict[str, Callable[[], Any]]
    max_event_age: dt.timedelta = dt.timedelta(seconds=60)
    last_checked: dt.datetime | None = None
    history: list[dict[str, Any]] = field(default_factory=list)
    # Optional run-outcome notifier (pipeline/notifications.RunNotifier)
    # — the reference's SNS success/failure lambda-destination seam
    # (terraform/aws_sns.tf): every firing record is published, outcome-
    # routed; a dead channel never fails the run (fire-and-forget).
    notifier: Any | None = None

    def run_due(self, now: dt.datetime) -> list[dict[str, Any]]:
        since = self.last_checked or now - dt.timedelta(minutes=1)
        fired: list[dict[str, Any]] = []
        for rule in self.rules:
            for when in rule.schedule.fires_between(since, now):
                record: dict[str, Any] = {
                    "operation": rule.operation,
                    "scheduled_for": when,
                    "schedule": rule.schedule.expression,
                }
                if now - when > self.max_event_age:
                    record["status"] = "dropped_stale"
                    fired.append(record)
                    continue
                handler = self.dispatch.get(rule.operation)
                if handler is None:
                    record["status"] = "no_handler"
                    fired.append(record)
                    continue
                try:
                    record["result"] = handler()
                    record["status"] = "ok"
                except Exception as exc:  # no retry: maximum_retry_attempts=0
                    record["status"] = "error"
                    record["error"] = repr(exc)
                fired.append(record)
        self.last_checked = now
        self.history.extend(fired)
        if self.notifier is not None:
            for record in fired:
                self.notifier.notify(record)
        return fired
