#!/usr/bin/env bash
# Environment bring-up (reference scripts/setup.sh / setup-training.sh
# role).  The reference creates a venv and pip-installs
# torch+tortoise; the TPU port's dependencies are jax/flax/optax +
# numpy (and optionally torch-cpu for the parity suite), which in the
# supported images are PREINSTALLED — this script only verifies them
# and builds the native melbin loader.
#
#   ./scripts/setup.sh            # verify deps + build native pieces
#   ./scripts/setup.sh --training # also verify training-only deps
set -euo pipefail
cd "$(dirname "$0")/.."

python - <<'EOF'
import importlib, sys
need = ["jax", "numpy", "yaml"]
opt = ["torch", "transformers", "pytest"]
missing = [m for m in need if importlib.util.find_spec(m) is None]
if missing:
    sys.exit(f"missing required packages: {missing}; install jax for "
             "your TPU runtime (pip install 'jax[tpu]')")
for m in opt:
    if importlib.util.find_spec(m) is None:
        print(f"note: optional package {m!r} absent "
              "(parity tests / weight conversion need it)")
import jax
print("jax", jax.__version__, "backend:", jax.default_backend(),
      "devices:", len(jax.devices()))
EOF

# native melbin dataset loader (data/native_loader.py dlopens this)
if command -v g++ >/dev/null; then
    make -C native 2>/dev/null || \
        g++ -O2 -shared -fPIC -o native/libmelbin.so native/melbin.cpp
    echo "native/libmelbin.so built"
else
    echo "note: no g++ — the pure-python melbin fallback will be used"
fi

if [[ "${1:-}" == "--training" ]]; then
    python - <<'EOF'
import importlib
for m in ["optax", "h5py", "wandb"]:
    found = importlib.util.find_spec(m) is not None
    print(("ok:   " if found else "note: optional ") + m)
EOF
fi
echo "setup complete"
