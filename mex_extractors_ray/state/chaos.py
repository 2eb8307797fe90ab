"""Chaos failpoints: deterministic worker-kill injection for fault-
tolerance tests.

A site is ARMED by creating ``$MEX_CHAOS_DIR/<site>`` (default
``/tmp/mex_chaos``). The first worker that reaches the site consumes the
flag with an atomic rename (exactly ONE process dies even when many race)
and SIGKILLs itself — a real, uncatchable worker death in the middle of
real work, not a mocked exception. The ``<site>.fired`` marker left
behind lets the test assert the kill actually happened mid-run.

Cost when unarmed: one ``os.path.exists`` on a non-existent path per
call site invocation (~1 µs) — sites are placed per partition-group /
per round, never per row.

Kept in-tree (not test-only) deliberately: on a real multi-node cluster
this is how you rehearse node loss against a staging lake.
"""

from __future__ import annotations

import os
import signal


def chaos_dir() -> str:
    return os.environ.get("MEX_CHAOS_DIR", "/tmp/mex_chaos")


def arm(site: str) -> str:
    """Arm ``site`` (driver/test side). Returns the flag path."""
    d = chaos_dir()
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, site)
    with open(p, "w") as f:
        f.write("armed")
    return p


def fired(site: str) -> bool:
    """True iff some worker consumed the flag and killed itself."""
    return os.path.exists(os.path.join(chaos_dir(), site + ".fired"))


def disarm(site: str) -> None:
    for suffix in ("", ".fired"):
        try:
            os.remove(os.path.join(chaos_dir(), site + suffix))
        except OSError:
            pass


def maybe_kill(site: str) -> None:
    """Worker-side failpoint: if ``site`` is armed, consume the flag and
    SIGKILL this process. The rename is atomic, so exactly one of N
    racing workers dies; everyone else (and every retry) sees the site
    disarmed."""
    p = os.path.join(chaos_dir(), site)
    if not os.path.exists(p):
        return
    try:
        os.rename(p, p + ".fired")
    except OSError:
        return  # another worker consumed it first
    os.kill(os.getpid(), signal.SIGKILL)
