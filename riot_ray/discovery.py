"""Service discovery + liveness for serving actors — the Ray-native
rebuild of riot's etcd registration and heartbeat/restart layer.

Reference semantics being mirrored (not ported):

* ``net/grpc/etcd.go:36-67`` — each server registers
  ``(service, host, port)`` in etcd with a TTL lease (``grpclb.Register
  ... time.Second*10, 15``) and unregisters on shutdown; clients resolve
  the service name to the live endpoint set.
* ``net/grpc/grpc.go:84-87`` — the ``HeartBeat`` RPC echoes the request
  message back (``return &pb.Reply{Result: in.Msg}``).
* ``net/heartb/heart.go:48-114`` — a watcher pings every second; a
  failed RPC or a wrong echo increments a failure counter, and once it
  exceeds 3 the watcher runs the restart command and resets the counter.

The Ray translation: etcd becomes a **named registry actor** (Ray's
named-actor table is the cluster-wide KV that etcd provides riot) with
TTL leases renewed by heartbeats; the restart command becomes a Python
callback (in-cluster restart of a replica actor).  Ray already
auto-restarts crashed actors (``max_restarts``), so the monitor's
restart path covers the cases Ray can't: an actor past its restart
budget, or one that is alive but wedged (ping echoes wrong / times out).

This module is deliberately NOT Ray Data: discovery is shared mutable
control-plane state, the one place the brief sanctions raw actors.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

__all__ = [
    "ServiceRegistry",
    "get_registry",
    "HeartbeatMonitor",
    "DEFAULT_TTL_S",
    "FAIL_LIMIT",
]

# etcd.go registers with a 10s heartbeat / 15s TTL lease; keep the ratio.
DEFAULT_TTL_S = 15.0
# heart.go restarts once rpc > 3 consecutive failures.
FAIL_LIMIT = 3

_NAMESPACE = "riot_ray"


class ServiceRegistry:
    """TTL-lease service table (the etcd analog), run as a named actor.

    Plain class so it is unit-testable without Ray; wrap with
    :func:`get_registry` for the cluster-wide named-actor instance.
    Entries are ``service -> instance -> (meta, deadline, epoch)``; an
    entry past its deadline is dead and pruned on the next touch —
    exactly etcd's lease expiry, driven lazily since the registry only
    matters at lookup/renew time.
    """

    def __init__(self):
        self._t: dict[str, dict[str, tuple[dict, float, int]]] = {}
        self._epoch = 0

    def register(self, service: str, instance: str, meta: dict | None = None,
                 ttl_s: float = DEFAULT_TTL_S) -> int:
        """Create/refresh a lease; returns the registration epoch (rises
        on every (re-)register, so clients can detect replacement)."""
        self._epoch += 1
        self._t.setdefault(service, {})[instance] = (
            dict(meta or {}), time.monotonic() + ttl_s, self._epoch)
        return self._epoch

    def renew(self, service: str, instance: str,
              ttl_s: float = DEFAULT_TTL_S) -> bool:
        """Heartbeat lease renewal.  False = lease unknown or already
        expired; the caller must re-register (etcd lease semantics —
        a dead lease cannot be renewed)."""
        ent = self._t.get(service, {}).get(instance)
        if ent is None or ent[1] < time.monotonic():
            self._t.get(service, {}).pop(instance, None)
            return False
        self._t[service][instance] = (ent[0], time.monotonic() + ttl_s, ent[2])
        return True

    def unregister(self, service: str, instance: str) -> None:
        self._t.get(service, {}).pop(instance, None)

    def lookup(self, service: str) -> dict[str, dict]:
        """Live instances of a service: ``{instance: meta}``, expired
        leases pruned."""
        now = time.monotonic()
        ents = self._t.get(service, {})
        dead = [k for k, (_, dl, _) in ents.items() if dl < now]
        for k in dead:
            del ents[k]
        return {k: dict(m) for k, (m, _, _) in ents.items()}

    def services(self) -> list[str]:
        return sorted(s for s in self._t if self.lookup(s))

    def ping(self, msg: int = 1) -> int:
        """HeartBeat echo (grpc.go:84-87 returns ``in.Msg``)."""
        return msg


def get_registry(name: str = "riot-registry", detached: bool = False):
    """Get-or-create the cluster-wide registry actor (actor-table analog
    of riot's shared etcd).  Idempotent across drivers in the same Ray
    cluster via the fixed name + namespace."""
    import ray

    Reg = ray.remote(ServiceRegistry)
    return Reg.options(
        name=name,
        namespace=_NAMESPACE,
        get_if_exists=True,
        lifetime="detached" if detached else None,
        max_restarts=3,
        num_cpus=0,
    ).remote()


@dataclass
class _Watch:
    ping: object          # () -> ObjectRef echoing the msg
    restart: object       # () -> None; invoked after FAIL_LIMIT misses
    fails: int = 0
    restarts: int = 0
    meta: dict = field(default_factory=dict)


class HeartbeatMonitor:
    """heart.go's watcher loop, driver-side and tick-testable.

    Each tick pings every watched target with a nonce and expects the
    echo back within ``timeout_s``.  A missing/raised/mismatched reply
    increments the failure counter; once it EXCEEDS ``fail_limit`` the
    restart callback runs and the counter resets to 0 (heart.go resets
    ``rpc = 0`` inside ``restart``).  ``tick()`` is the unit of work so
    tests never sleep; ``run()`` is the 1s production loop.
    """

    def __init__(self, fail_limit: int = FAIL_LIMIT, timeout_s: float = 5.0,
                 registry=None, service: str | None = None):
        self._targets: dict[str, _Watch] = {}
        self.fail_limit = fail_limit
        self.timeout_s = timeout_s
        self._registry = registry
        self._service = service
        self._msg = 0

    def watch(self, name: str, ping, restart, meta: dict | None = None):
        self._targets[name] = _Watch(ping, restart, meta=dict(meta or {}))

    def unwatch(self, name: str):
        self._targets.pop(name, None)

    def tick(self) -> dict[str, int]:
        """One heartbeat round; returns {name: consecutive_fails}."""
        import ray

        self._msg += 1
        refs = {}
        for name, w in self._targets.items():
            try:
                refs[name] = w.ping(self._msg)
            except Exception:
                refs[name] = None
        for name, ref in refs.items():
            w = self._targets[name]
            ok = False
            if ref is not None:
                try:
                    ready, _ = ray.wait([ref], timeout=self.timeout_s)
                    ok = bool(ready) and ray.get(ready[0]) == self._msg
                except Exception:
                    ok = False
            if ok:
                w.fails = 0
                if self._registry is not None and self._service:
                    # lease renewal rides the successful heartbeat
                    try:
                        alive = ray.get(self._registry.renew.remote(
                            self._service, name))
                        if not alive:
                            self._registry.register.remote(
                                self._service, name, w.meta)
                    except Exception:
                        pass
            else:
                w.fails += 1
                if w.fails > self.fail_limit:
                    w.fails = 0
                    w.restarts += 1
                    try:
                        w.restart()
                    except Exception:
                        pass
        return {n: w.fails for n, w in self._targets.items()}

    def run(self, interval_s: float = 1.0, stop=None):
        """Production loop (heart.go pings every second).  ``stop`` is a
        ``threading.Event``-like object; absent, loops forever."""
        while stop is None or not stop.is_set():
            self.tick()
            time.sleep(interval_s)

    def restart_counts(self) -> dict[str, int]:
        return {n: w.restarts for n, w in self._targets.items()}
