"""Model registry (capability-parity with reference models/__init__.py).

Each model family lives in its own module as (config dataclass, init,
apply) pure functions.  ``load_model(name)`` resolves a name to a
(module, converted-params) pair, ingesting the reference's checkpoint
files when present (models/__init__.py:23-44 weight inventory).
"""
