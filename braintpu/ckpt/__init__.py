"""Checkpoint ingestion (torch → pytree) and native .npz persistence."""

from .convert import (
    convert_state_dict,
    convert_torch_checkpoint,
    flatten_pytree,
    load_pytree_npz,
    load_torch_checkpoint,
    save_pytree_npz,
    unflatten_pytree,
)

__all__ = [
    "convert_state_dict",
    "convert_torch_checkpoint",
    "flatten_pytree",
    "load_pytree_npz",
    "load_torch_checkpoint",
    "save_pytree_npz",
    "unflatten_pytree",
]
