"""Case-level inference: preprocess → sliding-window ensemble → export.

Replaces the reference's multi-script, multi-subprocess segmentation stage
(/root/reference/run_brats2021_inference_singlethread.py:161-327) with a
single in-process engine:

* **softmax-level ensemble** (canonical): mean of the two models' sigmoid
  region maps before thresholding + the KAIST 200-voxel ET post-process —
  the original winning recipe
  (ref: /root/reference/archived/kaist_original_inference.py:30-34).
* **label-level ensemble** (repo-parity): ``round((seg1 + seg2) / 2)`` on
  the two exported label maps
  (ref: run_brats2021_inference_singlethread.py:288-312).

Only NIfTI decode and the nonzero-bbox run on host; everything from z-score
to label painting is on-device XLA.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..io import nifti
from ..io.brats import BratsCase, load_case_volumes
from ..labels.convert import internal_to_brats2021, internal_to_brats2025
from ..labels.postprocess import et_min_size_postprocess
from ..models.unet3d import UNetConfig, fold_batchnorm
from ..pre.preprocess import preprocess_case
from .fullconv import fullconv_predict, predict_probs_fullconv
from .sliding_window import predict_probs, region_probs_to_labels, stack_folds

__all__ = ["ModelBundle", "InferenceEngine", "calculate_volumes", "uncrop_labels"]


def _cast_matmul_weights(stacked, cfg: UNetConfig, folded: bool):
    """Store conv/upconv/seg kernels at the compute dtype for inference.

    Every ``"w"`` kernel in the conv U-Net forward is cast with
    ``.astype(cfg.compute_dtype)`` at its point of use (models/unet3d.py:
    _conv3d_xla, upconv, seg head), so pre-casting the stored copy from
    f32 to bf16 is bit-identical — the cast merely moves from device to
    host — while halving weight HBM residency (dual 5-fold production
    ensemble: ~3.1 GB → ~1.6 GB) and halving the one-time parameter
    upload (the dominant cost of a fresh-process engine start on
    tunnel-attached devices: measured 119.7 s segmenting span, round 4).

    Normalization stats / scale / shift / bias leaves stay f32 (they are
    consumed in f32), and axial variants are excluded — their attention
    path casts weights to the *activation* dtype, which is f32 in spots.
    Only applied when the configured compute dtype is bf16 (a user
    override to f32 compute keeps full-precision weights).

    Restricted to folded-BN bundles (the ``folded`` flag from
    ``from_folds`` — ``cfg.norm == "batch"`` alone is not enough, since a
    ``fold_bn=False`` BN bundle keeps its norm ops in the forward pass and
    is structurally the program class that miscompiles): with
    bf16-STORED weights on an unfolded GroupNorm net, the XLA:TPU
    executable for the TTA sliding-window scan computes garbage (NaN
    probabilities → empty segmentations) on this backend, while the
    numerically identical program with the weights left at their loaded
    storage dtype (f16 npz / f32 random-init — the use-site convert is a
    real op) is correct and a CPU replay of the bf16-stored program is
    also correct — i.e. a
    backend miscompilation of that program variant, not a semantics
    difference (measured 2026-08-20 on the trained model2-GN checkpoint:
    cast+TTA NaN in two independent processes, uncast+TTA clean at every
    mirror_chunk, CPU cast+TTA clean; see PERF.md round-5 addendum).
    The latency-critical flagship member (model1-BN, folded) keeps the
    optimization; GN/instance bundles pay ~2× weight upload instead of
    risking a silently-empty segmentation.
    """
    # dtype-normalized: a config carrying jnp.dtype('bfloat16') or the
    # string 'bfloat16' must not silently skip the HBM/upload optimization
    if (
        cfg.axial_attention
        or not folded
        or jnp.dtype(cfg.compute_dtype) != jnp.dtype(jnp.bfloat16)
    ):
        return stacked

    def cast(path, leaf):
        last = path[-1]
        key = getattr(last, "key", None)
        if key == "w" and getattr(leaf, "ndim", 0) >= 5:
            return leaf.astype(jnp.bfloat16)
        return leaf

    return jax.tree_util.tree_map_with_path(cast, stacked)


@dataclass
class ModelBundle:
    """One architecture + its stacked fold weights, inference-ready."""

    cfg: UNetConfig
    params_stacked: Dict[str, Any]  # leading fold axis on every leaf
    folded: bool = False
    name: str = ""

    @classmethod
    def from_folds(
        cls,
        cfg: UNetConfig,
        fold_params: Sequence[Dict[str, Any]],
        fold_bn: bool = True,
        name: str = "",
    ) -> "ModelBundle":
        """Stack fold pytrees; pre-fold BatchNorm when possible (faster eval).

        Host-resident folds (numpy / CPU arrays — every checkpoint and
        random-init path) are folded and stacked ON HOST: the per-block
        jnp ops in fold_batchnorm otherwise each become an accelerator
        dispatch (hundreds of tunnel round-trips per engine build), and
        the stacked result rides to the device in one transfer at the
        first forward instead.
        """

        def on_host(x) -> bool:
            if isinstance(x, np.ndarray):
                return True
            devs = getattr(x, "devices", None)
            return devs is not None and all(d.platform == "cpu" for d in x.devices())

        host = all(on_host(leaf) for leaf in jax.tree_util.tree_leaves(fold_params[0]))
        ctx = (
            jax.default_device(jax.local_devices(backend="cpu")[0])
            if host
            else contextlib.nullcontext()
        )
        with ctx:
            folded = False
            if fold_bn and cfg.norm == "batch":
                fold_params = [fold_batchnorm(p, cfg) for p in fold_params]
                folded = True
            stacked = stack_folds(fold_params)
        stacked = _cast_matmul_weights(stacked, cfg, folded)
        if host:
            # one explicit residency transfer: numpy leaves left in the
            # bundle would re-upload all fold weights on EVERY jit call
            stacked = jax.device_put(stacked)
        return cls(cfg, stacked, folded, name or cfg.name)


def uncrop_labels(seg_cropped: np.ndarray, crop) -> np.ndarray:
    """Place cropped-space labels back into the original volume extent."""
    out = np.zeros(crop.original_shape, dtype=seg_cropped.dtype)
    out[crop.slices] = seg_cropped
    return out


def calculate_volumes(
    seg: np.ndarray,
    voxel_volume_cm3: float,
    et_label: int = 3,
    convention: str = "brats",
) -> Dict[str, float]:
    """NCR/ED/ET/TC/WT volumes in cm³ from a label map.

    (ref semantics: run_brats2021_inference_singlethread.py:217-243, which
    hard-codes ET=4; here the ET label follows the active convention.)
    ``convention="internal"`` handles nnU-Net internal space, where 1=ED and
    2=NCR are swapped relative to BraTS (labels/convert.py).
    """
    ncr_label, ed_label = (2, 1) if convention == "internal" else (1, 2)
    ncr = float((seg == ncr_label).sum())
    ed = float((seg == ed_label).sum())
    et = float((seg == et_label).sum())
    return {
        "NCR": ncr * voxel_volume_cm3,
        "ED": ed * voxel_volume_cm3,
        "ET": et * voxel_volume_cm3,
        "TC": (ncr + et) * voxel_volume_cm3,
        "WT": (ncr + ed + et) * voxel_volume_cm3,
    }


@dataclass
class InferenceEngine:
    """Multi-model, multi-fold BraTS segmentation engine."""

    models: List[ModelBundle]
    step_size: float = 0.5
    tta: bool = True
    ensemble: str = "softmax"  # "softmax" (canonical) | "label" (repo parity)
    et_min_voxels: int = 200  # 0 disables; applied only in softmax mode
    output_convention: str = "brats2025"  # "brats2025" | "brats2021" | "internal"
    #: "sliding" — canonical nnU-Net 128³/50 %-overlap Gaussian-blended
    #: sliding window (bit-parity with the reference recipe).
    #: "fullconv" — whole-volume fully-convolutional forward (~3× fewer
    #: FLOPs; see infer/fullconv.py for the documented semantics deltas).
    mode: str = "sliding"
    #: optional jax.sharding.Mesh with a 'data' axis: predict_cases_batched
    #: shards each case batch over it (case-level data parallelism; GSPMD
    #: partitions the batch-parallel fullconv program, no collectives on
    #: the forward path — SURVEY.md §2.2 DP row).  Single-case calls are
    #: unaffected unless ``spatial_shard`` is set.
    mesh: Optional[Any] = None
    #: with ``mesh`` and ``mode="fullconv"``: shard each SINGLE case's X
    #: axis across the mesh (GSPMD halo-exchange partitioning,
    #: infer.fullconv.fullconv_predict_spatial) — cuts per-chip activation
    #: memory and single-case latency instead of batch throughput.  The
    #: X extent is padded up to a multiple of (mesh size × 2**num_pool)
    #: and sliced back; like fullconv's bucket padding, the extra
    #: background border shifts values near the volume edge (background
    #: on real crops) — the sharding itself is exact (tested).
    spatial_shard: bool = False

    def warmup(
        self,
        bucket_shape: Tuple[int, int, int] = (192, 192, 160),
        batch_size: int = 0,
    ) -> float:
        """Trigger all compilations for a bucket shape before the first case.

        A cold fullconv ensemble costs minutes of XLA compilation; calling
        this (e.g. on a background thread while the first case downloads —
        ``cli serve`` does this at startup unless --no-warmup) moves that
        cost off the first request.  Pass ``batch_size`` to warm the program
        :meth:`predict_cases_batched` actually runs (its batch dimension
        and sharding differ from the single-case B=1 program).  Returns
        seconds spent.  Persistent-cache hits (utils.compcache) make
        reruns cheap.
        """
        t0 = time.perf_counter()
        # fully nonzero so crop-to-nonzero keeps the exact bucket extent
        dummy = np.ones((4,) + tuple(bucket_shape), np.float32)
        if batch_size > 0 and self.mode == "fullconv":
            div = max(2**m.cfg.num_pool for m in self.models)
            pre = preprocess_case(dummy, patch_size=(div,) * 3, pad_multiple=div)
            vol = jnp.moveaxis(jnp.asarray(pre.data), 0, -1)[None]
            target = self._batch_target(batch_size)
            jax.block_until_ready(self._batched_fullconv(vol, target))
        else:
            self.predict_case_array(dummy)
        return time.perf_counter() - t0

    def predict_case_array(
        self, data_cxyz: np.ndarray
    ) -> Tuple[np.ndarray, Dict[str, Any]]:
        """(C, X, Y, Z) float stack → (labels in output convention, info)."""
        t0 = time.perf_counter()
        if len({m.cfg.num_classes for m in self.models}) != 1:
            raise ValueError("ensemble models must share num_classes")
        if self.mode == "fullconv":
            # every axis must divide through all pool stages of every model
            div = max(2**m.cfg.num_pool for m in self.models)
            pre = preprocess_case(data_cxyz, patch_size=(div,) * 3, pad_multiple=div)
        else:
            # pad to the largest patch across models so every model can tile it
            patch = tuple(
                max(m.cfg.patch_size[i] for m in self.models) for i in range(3)
            )
            pre = preprocess_case(data_cxyz, patch_size=patch)
        info: Dict[str, Any] = {"preprocess_s": time.perf_counter() - t0}
        # the shape device programs actually run at (crop + pad); bench.py
        # derives analytic ensemble FLOPs → MFU from it
        info["bucket_shape"] = tuple(int(s) for s in pre.data.shape[1:])

        t1 = time.perf_counter()
        vol = jnp.asarray(pre.data)  # one H2D transfer, shared across models
        per_model_probs = []
        for mi, m in enumerate(self.models):
            if self.mode == "fullconv" and self.spatial_shard and self.mesh is not None:
                probs = self._spatial_fullconv(vol, m, mi)
            elif self.mode == "fullconv":
                probs = predict_probs_fullconv(
                    m.params_stacked, vol, m.cfg, tta=self.tta, folded=m.folded
                )
            else:
                probs = predict_probs(
                    m.params_stacked,
                    vol,
                    m.cfg,
                    step_size=self.step_size,
                    tta=self.tta,
                    folded=m.folded,
                )
            per_model_probs.append(probs)
        info["predict_s"] = None  # set after sync below

        seg_internal = self._ensemble_labels(per_model_probs, pre)
        info["predict_s"] = time.perf_counter() - t1
        out = self._to_output_convention(seg_internal, pre)
        info["total_s"] = time.perf_counter() - t0
        info["num_models"] = len(self.models)
        info["ensemble"] = self.ensemble
        return out, info

    def _ensemble_labels(self, per_model_probs, pre) -> np.ndarray:
        """Model-ensemble probability maps → internal-label segmentation."""
        undo = pre.undo_slices
        # label mode applies with ANY model count: the repo-parity recipe
        # (run_brats2021_inference_singlethread.py:288-312) never runs the
        # ET min-size rule, so a single-model label run must not either
        if self.ensemble == "label":
            segs = [
                np.asarray(region_probs_to_labels(p)[undo]) for p in per_model_probs
            ]
            return np.round(
                sum(s.astype(np.float32) for s in segs) / len(segs)
            ).astype(np.uint8)
        mean_probs = sum(per_model_probs) / len(per_model_probs)
        seg_internal = np.asarray(region_probs_to_labels(mean_probs)[undo])
        if self.et_min_voxels:
            seg_internal = et_min_size_postprocess(
                seg_internal,
                et_label=3,
                replace_with=2,
                min_voxels=self.et_min_voxels,
            )
        return seg_internal

    def _to_output_convention(self, seg_internal: np.ndarray, pre) -> np.ndarray:
        full = uncrop_labels(np.asarray(seg_internal), pre.crop)
        if self.output_convention == "brats2025":
            return np.asarray(internal_to_brats2025(full))
        if self.output_convention == "brats2021":
            return np.asarray(internal_to_brats2021(full))
        return full

    def _case_volumes(self, seg, zooms) -> dict:
        """Per-region volumes (cm³) of an output-convention segmentation."""
        voxel_cm3 = float(np.prod(zooms[:3])) / 1000.0
        et_label = 4 if self.output_convention == "brats2021" else 3
        conv = "internal" if self.output_convention == "internal" else "brats"
        return calculate_volumes(seg, voxel_cm3, et_label, conv)

    def _spatial_fullconv(self, vol_cxyz, m, mi: int):
        """Single-case spatially-sharded fullconv for one model bundle.

        Pads X up to a multiple of (mesh_size × 2**num_pool) at the high
        end so shard boundaries stay pool-aligned, then slices the rows
        back off.  The contract is "fullconv of the padded volume": the
        extra zero border influences values within the receptive field of
        the high-X edge exactly like a larger fullconv bucket would.
        """
        from .fullconv import fullconv_predict_spatial

        n = self.mesh.shape["data"]
        div = 2**m.cfg.num_pool
        x = jnp.moveaxis(vol_cxyz, 0, -1)  # (X, Y, Z, C)
        X = x.shape[0]
        target = -(-X // (n * div)) * n * div
        if target != X:
            x = jnp.pad(x, ((0, target - X), (0, 0), (0, 0), (0, 0)))
        # reuse the cached mesh-replicated fold weights: re-broadcasting
        # hundreds of MB per case through jax.device_put is pure overhead
        # on the latency-sensitive single-case path
        probs = fullconv_predict_spatial(
            self._mesh_replicated_params()[mi], x, m.cfg, self.mesh,
            axis="data", num_mirror=8 if self.tta else 1, folded=m.folded,
        )
        return probs[:X]

    def _mesh_replicated_params(self):
        """Fold weights replicated onto the mesh (cached): committed
        single-device arrays can't mix with mesh-sharded inputs."""
        if getattr(self, "_mesh_params", None) is None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            rep = NamedSharding(self.mesh, P())
            self._mesh_params = [
                jax.device_put(m.params_stacked, rep) for m in self.models
            ]
        return self._mesh_params

    def _batch_target(self, batch_size: int) -> int:
        """Fixed batch shape for batched fullconv: batch_size, rounded up
        to a multiple of the mesh data axis when sharding."""
        if self.mesh is not None:
            nd = self.mesh.shape["data"]
            return -(-batch_size // nd) * nd
        return batch_size

    def _batched_fullconv(self, vols: jnp.ndarray, target: int) -> List[Any]:
        """Run every model on a case batch padded to ``target`` rows.

        Padding replicates the last case so EVERY chunk (partial flushes,
        end-of-stream drains) runs the same compiled program per bucket
        shape — whole-ensemble XLA compiles cost minutes, so the batch
        dimension must never vary.  Padded rows are the caller's to drop.
        With a mesh, the batch axis is sharded over 'data' (case-level DP,
        no forward-path collectives).
        """
        n_pad = target - vols.shape[0]
        if n_pad:
            vols = jnp.concatenate([vols, jnp.repeat(vols[-1:], n_pad, axis=0)])
        if self.mesh is not None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            vols = jax.device_put(vols, NamedSharding(self.mesh, P("data")))
        per_model = []
        for mi, m in enumerate(self.models):
            params = (
                self._mesh_replicated_params()[mi]
                if self.mesh is not None
                else m.params_stacked
            )
            per_model.append(
                fullconv_predict(
                    params, vols, m.cfg,
                    num_mirror=8 if self.tta else 1, folded=m.folded,
                )
            )
        return per_model

    def predict_cases_batched(
        self, cases: List[BratsCase], output_dir: Optional[Path] = None,
        batch_size: int = 4, max_pending: Optional[int] = None,
        keep_volumes: Optional[bool] = None,
    ) -> List[Tuple[Optional[np.ndarray], Dict[str, Any]]]:
        """Multi-case throughput on one chip — or across a mesh
        (BASELINE config 4).

        With ``self.mesh`` set (a Mesh with a 'data' axis), each batch is
        sharded case-wise across the mesh: fold weights replicate once,
        the batch axis partitions, and XLA runs the embarrassingly
        case-parallel forward with no cross-device collectives.

        Requires ``mode='fullconv'``: cases stream in through a
        :class:`~braintpu.io.brats.CasePrefetcher` (host decode overlapped
        with device compute), are grouped by padded bucket shape, stacked on
        the batch axis and run through the whole-volume ensemble together.
        Every chunk — including partial flushes and end-of-stream drains —
        is padded with a replicated last case to one fixed batch shape
        (``batch_size``, rounded up to the mesh size when sharding), so
        each bucket shape compiles exactly ONE whole-ensemble program;
        padded rows are dropped from results.  Accelerator memory is
        bounded: at most ``max_pending`` (default
        ``min(max(2*batch_size, 8), 16)``) preprocessed cases are
        device-resident at once — when the cap is hit, the fullest bucket
        is flushed as a partial batch — and each case's arrays are freed
        as soon as its segmentation is written.  GroupNorm statistics stay per-sample
        (batch axis is the normalization boundary) on every path — the
        fused stage kernel carries per-sample stats and input affines —
        so results match per-case fullconv calls (exactly on the XLA
        path; to bf16 rounding when the opt-in kernel path is live).

        Host memory is bounded too: with ``output_dir`` set, segmentations
        are written to disk and the returned entries carry ``(None, info)``
        — retaining every uncropped uint8 volume (~9 MB each) across a
        hundreds-of-cases throughput run would hold GBs of host RAM for
        data already on disk.  Pass ``keep_volumes=True`` to also return
        the arrays; without ``output_dir`` volumes are always returned.
        """
        if keep_volumes is None:
            keep_volumes = output_dir is None
        if self.mode != "fullconv":
            raise ValueError("predict_cases_batched requires mode='fullconv'")
        if self.spatial_shard:
            # spatial sharding exists so ONE case's activations can exceed a
            # single chip (halo-exchange partitioning of the volume); the
            # batched runner instead placed a full unsharded volume per chip
            # — silently changing that contract invites an HBM OOM
            raise ValueError(
                "predict_cases_batched is case-data-parallel and incompatible "
                "with spatial_shard=True: batching places one whole volume "
                "per chip, which defeats the reason to shard spatially. Use "
                "per-case predict_case calls for spatially-sharded inference, "
                "or spatial_shard=False for batched throughput.")
        div = max(2**m.cfg.num_pool for m in self.models)
        if max_pending is None:
            # pending cases are DEVICE-resident (preprocess returns device
            # arrays); the cap bounds accelerator memory alongside the
            # forward's activation peak, so it stays small even for large
            # batch sizes (16 × ~113 MB bucket ≈ 1.8 GB of HBM)
            max_pending = min(max(2 * batch_size, 8), 16)
        target = self._batch_target(batch_size)
        results: List[Optional[Tuple[np.ndarray, Dict[str, Any]]]] = [None] * len(cases)
        # bucket shape → [(case_index, case, affine, zooms, preprocess_result)]
        pending: Dict[Tuple[int, ...], List[Tuple[int, Any, Any, Any, Any]]] = {}
        n_pending = 0
        # dispatched-but-undrained device batches: fullconv_predict dispatches
        # asynchronously, so the host can run the previous batch's label
        # ensemble / readback / NIfTI save WHILE the device computes the next
        # batch.  Depth 1 (one computing + one being drained) bounds the
        # extra HBM to one batch of probability maps (~2 × B × 70 MB).
        # Round-3 measured the un-overlapped loop at 13.4 s/case vs 8.4–9.8
        # sequential: the device idled through every host ensemble+save span.
        inflight: List[Tuple[List[Tuple[int, Any, Any, Any, Any]], List[Any], float]] = []

        def dispatch(shape: Tuple[int, ...]) -> None:
            nonlocal n_pending
            entries = pending.pop(shape)
            n_pending -= len(entries)
            for start in range(0, len(entries), batch_size):
                chunk = entries[start : start + batch_size]
                t0 = time.perf_counter()
                vols = jnp.stack(
                    [jnp.moveaxis(jnp.asarray(e[4].data), 0, -1) for e in chunk]
                )
                per_model = self._batched_fullconv(vols, target)
                inflight.append((chunk, per_model, t0))
                while len(inflight) > 1:
                    drain_one()

        def drain_one() -> None:
            chunk, per_model, t0 = inflight.pop(0)
            # sync before timing: un-synced clocks measure dispatch latency,
            # not compute.  device_span includes any wait (it started at
            # dispatch), so overlapped host work shows up as device_span ≈
            # batch compute rather than compute + host.
            jax.block_until_ready(per_model)
            device_span = time.perf_counter() - t0
            t1 = time.perf_counter()
            for bi, (i, case, affine, zooms, pre) in enumerate(chunk):
                seg_internal = self._ensemble_labels([p[bi] for p in per_model], pre)
                out = self._to_output_convention(seg_internal, pre)
                info = {
                    "case_id": case.case_id,
                    "batch_seconds": device_span,
                    "batch_size": len(chunk),
                    "volumes_cm3": self._case_volumes(out, zooms),
                }
                if output_dir is not None:
                    path = Path(output_dir) / f"{case.case_id}.nii.gz"
                    nifti.save(out.astype(np.uint8), path, affine=affine)
                    info["output_path"] = str(path)
                info["ensemble_host_s"] = time.perf_counter() - t1
                results[i] = (out if keep_volumes else None, info)

        from ..io.brats import CasePrefetcher

        for i, (case, (data, affine, zooms)) in enumerate(
            CasePrefetcher(cases, depth=2)
        ):
            pre = preprocess_case(data, patch_size=(div,) * 3, pad_multiple=div)
            del data  # free the raw decode; `pre` holds the cropped copy
            shape = tuple(pre.data.shape)
            pending.setdefault(shape, []).append((i, case, affine, zooms, pre))
            n_pending += 1
            if len(pending[shape]) >= batch_size:
                dispatch(shape)
            elif n_pending >= max_pending:
                dispatch(max(pending, key=lambda s: len(pending[s])))
        for shape in sorted(pending, key=lambda s: -len(pending[s])):
            dispatch(shape)
        while inflight:
            drain_one()
        return [r for r in results if r is not None]

    def predict_case(
        self,
        case: BratsCase,
        output_path: Optional[Path] = None,
        loaded: Optional[Tuple[np.ndarray, np.ndarray, Tuple[float, ...]]] = None,
    ) -> Tuple[np.ndarray, Dict[str, Any]]:
        """Load a case from disk, segment it, optionally save NIfTI + volumes.

        Pass ``loaded=(data, affine, zooms)`` (e.g. from
        :class:`braintpu.io.brats.CasePrefetcher`) to overlap the next
        case's host-side decode with this case's device compute.
        """
        data, affine, zooms = loaded if loaded is not None else load_case_volumes(case)
        seg, info = self.predict_case_array(data)
        info["volumes_cm3"] = self._case_volumes(seg, zooms)
        info["case_id"] = case.case_id
        if output_path is not None:
            nifti.save(seg.astype(np.uint8), output_path, affine=affine)
            info["output_path"] = str(output_path)
        return seg, info
