"""Run-completion notification hook (reference: sms.py, a Twilio SMS pusher with
scrubbed credentials). Network egress is out of scope for a compute framework;
this ships a print/log notifier with the same call shape, and a pluggable hook
for environments that have a real transport."""

from __future__ import annotations

from typing import Callable, Optional

_SINK: Optional[Callable[[str], None]] = None


def set_notification_sink(fn: Callable[[str], None]) -> None:
    """Install a transport (e.g. a real SMS/webhook sender)."""
    global _SINK
    _SINK = fn


def send_notification(message: str) -> None:
    if _SINK is not None:
        _SINK(message)
    else:
        print(f"[notify] {message}", flush=True)
