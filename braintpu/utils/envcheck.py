"""Environment preflight checks.

Parity with /root/reference/scripts/check_compatibility.py:16-70 (8 checks:
interpreter, framework, accelerator, packages, model files, data), re-targeted
at the TPU stack: JAX version/backend, device inventory, required/optional
packages, checkpoint and knowledge-base presence.
"""

from __future__ import annotations

import importlib
import sys
from pathlib import Path
from typing import Dict, List, Optional

__all__ = ["run_env_checks", "format_env_report"]

REQUIRED_PACKAGES = ["jax", "numpy", "scipy", "optax"]
OPTIONAL_PACKAGES = ["torch", "matplotlib", "httpx", "sentence_transformers", "flax"]


def _check(name, ok, detail=""):
    return {"check": name, "ok": bool(ok), "detail": str(detail)}


def run_env_checks(checkpoint_dir: Optional[Path] = None) -> List[Dict]:
    checks: List[Dict] = []

    checks.append(
        _check(
            "python>=3.10",
            sys.version_info >= (3, 10),
            f"{sys.version_info.major}.{sys.version_info.minor}.{sys.version_info.micro}",
        )
    )

    try:
        import jax

        checks.append(_check("jax importable", True, jax.__version__))
        try:
            devices = jax.devices()
            kinds = {d.platform for d in devices}
            checks.append(
                _check(
                    "accelerator devices",
                    len(devices) > 0,
                    f"{len(devices)} × {sorted(kinds)}",
                )
            )
            # informational: CPU/GPU backends are valid (tests, dev boxes)
            has_tpu = any(d.platform == "tpu" for d in devices)
            checks.append(
                _check(
                    "tpu backend",
                    True,
                    "TPU backend active" if has_tpu else "running on CPU/GPU backend",
                )
            )
        except Exception as e:  # backend init failure
            checks.append(_check("accelerator devices", False, repr(e)))
    except Exception as e:
        checks.append(_check("jax importable", False, repr(e)))

    for pkg in REQUIRED_PACKAGES[1:]:
        try:
            mod = importlib.import_module(pkg)
            checks.append(_check(f"package {pkg}", True, getattr(mod, "__version__", "?")))
        except Exception as e:
            checks.append(_check(f"package {pkg}", False, repr(e)))

    for pkg in OPTIONAL_PACKAGES:
        try:
            importlib.import_module(pkg)
            checks.append(_check(f"optional {pkg}", True, "available"))
        except Exception:
            checks.append(_check(f"optional {pkg}", True, "absent (feature degrades gracefully)"))

    if checkpoint_dir is not None:
        ckpt = Path(checkpoint_dir)
        files = sorted(ckpt.glob("**/*.npz")) + sorted(ckpt.glob("**/*.model"))
        checks.append(
            _check(
                "model checkpoints",
                bool(files),
                f"{len(files)} file(s) under {ckpt}" if files else f"none under {ckpt}",
            )
        )

    from ..rag import builtin_knowledge_base

    kb = builtin_knowledge_base()
    checks.append(_check("knowledge base", len(kb) >= 7, f"{len(kb)} built-in documents"))
    return checks


def format_env_report(checks: List[Dict]) -> str:
    lines = ["Environment preflight:"]
    for c in checks:
        mark = "OK " if c["ok"] else "FAIL"
        lines.append(f"  [{mark}] {c['check']:<24} {c['detail']}")
    n_bad = sum(not c["ok"] for c in checks)
    lines.append("all checks passed" if n_bad == 0 else f"{n_bad} check(s) FAILED")
    return "\n".join(lines)
