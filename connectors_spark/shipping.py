"""Ship this package's code to Spark's Python workers BY VALUE.

Spark pickles closures and DataSource classes by module reference; the
worker processes don't necessarily have connectors_spark on their
sys.path (driver started from another directory, no --py-files).
Registering the package's loaded modules for cloudpickle by-value
serialization makes every shipped closure self-contained — no install
required on workers. Used by the streaming source registration and the
distributed commit-publish job. Idempotent and best-effort.
"""

from __future__ import annotations

_registered: set = set()


def ensure_shipped_by_value() -> None:
    # per-module, not a global latch: modules imported after an earlier
    # call (e.g. streaming.* after the first write) still get registered
    # on the next call
    import sys

    from pyspark import cloudpickle
    for name, mod in list(sys.modules.items()):
        if (name.startswith("connectors_spark") and mod is not None
                and name not in _registered):
            try:
                cloudpickle.register_pickle_by_value(mod)
                _registered.add(name)
            except Exception:  # pragma: no cover - best effort
                pass
