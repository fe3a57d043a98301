"""Unified command-line interface.

One ``braintpu`` entry point replaces the reference's constellation of
standalone scripts (SURVEY.md §2.1): ``run_full_pipeline.py``,
``run_brats2021_inference_singlethread.py``, ``convert_labels_to_brats.py``,
``evaluate_segmentation.py``, ``check_labels.py``, ``compare_segmentations.py``,
``visualize_segmentation.py``, ``feature_extraction/run_all.py``,
``generate_report_gemini.py``, ``generate_pdf_report.py``,
``RAG_Assistant/rag_assistant.py`` / ``vector_store_builder.py`` /
``test_rag.py``, ``scripts/check_compatibility.py``, ``api.py`` and
``convert_brats2025_naming.py`` — each as a subcommand sharing one process,
one device context and one config surface.

Run ``python -m braintpu.cli --help``.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


# ---------------------------------------------------------------------------
# engine construction
# ---------------------------------------------------------------------------


def load_engine(args):
    """Build an InferenceEngine from checkpoints (or random weights)."""
    import jax

    from .ckpt import convert_torch_checkpoint, load_pytree_npz
    from .infer import InferenceEngine, ModelBundle
    from .models import AXIAL_UNET, AXIAL_UNET_FULL, MODEL1_BN, MODEL2_GN_LARGE, init_params

    configs = {
        "model1": MODEL1_BN,
        "model2": MODEL2_GN_LARGE,
        "axial": AXIAL_UNET,
        "axial-full": AXIAL_UNET_FULL,
    }
    selected = (
        [n.strip() for n in args.models.split(",")]
        if args.models
        else ["model1", "model2"]
    )
    unknown = [n for n in selected if n not in configs]
    if unknown:
        raise SystemExit(
            f"unknown model(s) {unknown}; choose from {sorted(configs)}"
        )
    axial_selected = [n for n in selected if configs[n].axial_attention]
    if getattr(args, "mode", None) is None:
        # default mode: fullconv (production, ~2.6x faster measured) except
        # for axial models, whose patch-shape-bound positional embeddings
        # require the sliding recipe
        args.mode = "sliding" if axial_selected else "fullconv"
    elif args.mode == "fullconv" and axial_selected:
        raise SystemExit(
            f"--mode fullconv is incompatible with axial models "
            f"{axial_selected} (patch-shape-bound positional embeddings); "
            "use --mode sliding"
        )
    folds = list(range(args.folds))

    nnunet_tree = None  # lazily-discovered raw nnU-Net results tree

    def _nnunet_fold(name: str, f: int):
        """Raw reference RESULTS_FOLDER layout (trainer dirs × fold_N)."""
        nonlocal nnunet_tree
        if nnunet_tree is None:
            from .ckpt import discover_nnunet_tree

            nnunet_tree = discover_nnunet_tree(args.checkpoints)
        entry = nnunet_tree.get(name)
        return entry.folds.get(f) if entry else None

    bundles = []
    for name in selected:
        cfg = configs[name]
        fold_params = []
        for f in folds:
            loaded = None
            if args.checkpoints:
                root = Path(args.checkpoints)
                npz = root / name / f"fold_{f}.npz"
                torch_ckpt = root / name / f"fold_{f}" / "model_final_checkpoint.model"
                if npz.exists():
                    loaded = load_pytree_npz(npz)
                elif torch_ckpt.exists():
                    loaded = convert_torch_checkpoint(torch_ckpt, cfg)
                else:
                    tree_ckpt = _nnunet_fold(name, f)
                    if tree_ckpt is not None:
                        loaded = convert_torch_checkpoint(tree_ckpt, cfg)
            if loaded is None:
                if not args.random_weights:
                    raise SystemExit(
                        f"checkpoint for {name}/fold_{f} not found under "
                        f"{args.checkpoints!r}; pass --random-weights for a dry run"
                    )
                # stable seed (hash() is salted per process → irreproducible).
                # Int seed + CPU default device: random init draws with
                # numpy and keeps the leaves host-resident, so the bundle
                # ships to the device in ONE stacked transfer (the prior
                # per-tensor jax.random ops through the dispatch tunnel
                # measured 85 s of engine start-up).
                seed = selected.index(name) * 1000 + f
                cpu = jax.local_devices(backend="cpu")[0]
                with jax.default_device(cpu):
                    loaded = init_params(cfg, seed)
            fold_params.append(loaded)
        bundles.append(ModelBundle.from_folds(cfg, fold_params, name=name))

    mesh = None
    if getattr(args, "dp_devices", 0) and args.dp_devices > 1:
        from .parallel import make_mesh

        devs = jax.devices()
        if len(devs) < args.dp_devices:
            raise SystemExit(
                f"--dp-devices {args.dp_devices} but only {len(devs)} "
                "device(s) visible"
            )
        mesh = make_mesh(devs[: args.dp_devices], data=args.dp_devices)

    spatial = bool(getattr(args, "spatial_shard", False))
    if spatial:
        if mesh is None:
            raise SystemExit("--spatial-shard requires --dp-devices N (N > 1)")
        if (getattr(args, "mode", None) or "sliding") != "fullconv":
            raise SystemExit("--spatial-shard requires --mode fullconv")

    return InferenceEngine(
        models=bundles,
        tta=not args.no_tta,
        ensemble=args.ensemble,
        et_min_voxels=0 if args.no_et_postprocess else 200,
        output_convention=getattr(args, "convention", None) or "internal",
        mode=getattr(args, "mode", None) or "sliding",
        mesh=mesh,
        spatial_shard=spatial,
    )


def _add_engine_args(p, convention_default=None):
    p.add_argument(
        "--checkpoints",
        help="checkpoint root: model{1,2}/fold_N.npz layout, or a raw "
        "nnU-Net results tree (trainer dirs × fold_N/model_final_checkpoint.model)",
    )
    p.add_argument("--models", default="model1,model2", help="comma list: model1,model2")
    p.add_argument("--folds", type=int, default=5)
    if convention_default:
        p.add_argument(
            "--convention",
            choices=["internal", "brats2025", "brats2021"],
            default=convention_default,
            help="label convention of saved segmentations",
        )
    p.add_argument("--no-tta", action="store_true")
    p.add_argument("--ensemble", choices=["softmax", "label"], default="softmax")
    p.add_argument(
        "--mode",
        choices=["sliding", "fullconv"],
        default=None,
        help="fullconv (default for non-axial models): whole-volume "
        "production mode — measured 9.8 s/case vs sliding's ~26 s on one "
        "v5e chip, WT/TC label agreement 0.9999 between the modes "
        "(PERF.md round 3); sliding: the canonical bit-parity nnU-Net "
        "recipe (run_brats2021_inference_singlethread.py:98-105; default "
        "for axial models)",
    )
    p.add_argument("--no-et-postprocess", action="store_true")
    p.add_argument("--random-weights", action="store_true", help="random init (demo/bench)")


# ---------------------------------------------------------------------------
# subcommands
# ---------------------------------------------------------------------------


def cmd_pipeline(args):
    from .pipeline import Pipeline, PipelineConfig

    if getattr(args, "config", None):
        from .utils.config import load_config

        fc = load_config(args.config)
        s = fc.segmentation
        args.models = ",".join(s.models)
        args.folds = s.folds
        args.no_tta = not s.tta
        args.ensemble = s.ensemble
        args.no_et_postprocess = s.et_min_voxels == 0
        args.checkpoints = args.checkpoints or s.checkpoints
        # apply the config's mode BEFORE building the engine: load_engine's
        # axial-vs-fullconv guard validates args.mode, so a post-hoc
        # engine.mode overwrite would bypass it (axial positional
        # embeddings meeting a whole-volume shape crash deep in jax)
        args.mode = s.mode
        engine = load_engine(args)
        engine.step_size = s.step_size
        engine.et_min_voxels = s.et_min_voxels
        cfg = fc.pipeline_config()
    else:
        engine = load_engine(args)
        cfg = PipelineConfig(
            output_root=Path(args.output),
            use_llm_refinement=args.use_llm,
            generate_pdf=not args.no_pdf,
        )
    pipeline = Pipeline(
        engine,
        cfg,
        on_event=lambda e: print(f"STAGE:{e.stage}:{e.status} {e.detail or ''}"),
    )
    folders = [args.case_folder] + list(getattr(args, "more_case_folders", []) or [])
    if len(folders) == 1:
        result = pipeline.run_case(folders[0])
        print(json.dumps(result.summary, indent=2, default=str))
        return 0 if result.succeeded else 1
    # multi-case: overlap case N's host stages with case N+1's device
    # segmentation (Pipeline.run_cases one-case lookahead)
    results = pipeline.run_cases(folders)
    print(json.dumps([r.summary for r in results], indent=2, default=str))
    return 0 if all(r.succeeded for r in results) else 1


def cmd_segment(args):
    import contextlib

    from .io.brats import find_cases

    engine = load_engine(args)
    cases = find_cases(args.input)
    trace_ctx = contextlib.nullcontext()
    if getattr(args, "trace_dir", None):
        from .utils.profiling import device_trace

        trace_ctx = device_trace(args.trace_dir)
        print(f"capturing device trace to {args.trace_dir} "
              "(analyze with: braintpu profile-report <dir>)")
    if not cases:
        raise SystemExit(f"no complete BraTS case under {args.input}")
    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    # decide the execution path ONCE so the mode check fires before any
    # multi-minute warmup compile and warmup warms the program the run
    # will actually use (batched programs only run with >1 case)
    use_batched = bool(getattr(args, "batch_cases", 0)) and len(cases) > 1
    if use_batched and engine.mode != "fullconv":
        raise SystemExit("--batch-cases requires --mode fullconv")
    if use_batched and engine.spatial_shard:
        raise SystemExit(
            "--batch-cases and --spatial-shard are mutually exclusive: "
            "batching is case-data-parallel (one whole volume per chip), "
            "spatial sharding splits ONE volume across chips. Drop one.")
    if (
        engine.mesh is not None
        and not engine.spatial_shard
        and not use_batched
    ):
        print(
            "# warning: --dp-devices builds a device mesh, but this run "
            "takes the per-case path (single case or no --batch-cases) "
            "which does not use it; add --batch-cases N with multiple "
            "cases, or --spatial-shard, to engage the mesh"
        )
    if getattr(args, "warmup", False):
        secs = engine.warmup(batch_size=args.batch_cases if use_batched else 0)
        print(f"# warmup compile: {secs:.1f}s")
    with trace_ctx:
        return _run_segment(args, engine, cases, out, use_batched)


def _run_segment(args, engine, cases, out, use_batched=None):
    if use_batched is None:
        use_batched = bool(getattr(args, "batch_cases", 0)) and len(cases) > 1
    if use_batched:
        if engine.mode != "fullconv":
            raise SystemExit("--batch-cases requires --mode fullconv")
        results = engine.predict_cases_batched(
            cases, output_dir=out, batch_size=args.batch_cases
        )
        for seg, info in results:
            print(
                f"{info['case_id']}: batch of {info['batch_size']} in "
                f"{info['batch_seconds']:.1f}s  volumes={info['volumes_cm3']}"
            )
        return 0
    from .io.brats import CasePrefetcher

    for case, loaded in CasePrefetcher(cases):
        seg, info = engine.predict_case(
            case, out / f"{case.case_id}.nii.gz", loaded=loaded
        )
        print(f"{case.case_id}: {info['total_s']:.1f}s  volumes={info['volumes_cm3']}")
    return 0


def cmd_convert_labels(args):
    from .io import nifti
    from .labels import internal_to_brats2021, internal_to_brats2025

    img = nifti.load(args.input)
    data = img.get_fdata(dtype=np.float32)
    fn = internal_to_brats2021 if args.format == "brats2021" else internal_to_brats2025
    converted = np.asarray(fn(data)).astype(np.uint8)
    name = Path(args.input).name
    derived = name.replace(".nii", "_brats.nii")
    if derived == name:  # input without '.nii' (codec loads by content)
        derived = name + "_brats.nii.gz"
    out = args.output or str(Path(args.input).with_name(derived))
    if Path(out).resolve() == Path(args.input).resolve():
        raise SystemExit(
            f"refusing to overwrite the input {args.input!r}; pass a "
            "different --output"
        )
    nifti.save(converted, out, affine=img.affine)
    print(f"labels before: {sorted(np.unique(np.round(data)).astype(int).tolist())}")
    print(f"labels after:  {sorted(np.unique(converted).astype(int).tolist())}")
    print(f"saved: {out}")
    return 0


def cmd_evaluate(args):
    from .io import nifti
    from .labels import normalize_to_brats2025
    from .metrics import evaluate_segmentation

    pred = np.round(nifti.load(args.pred).get_fdata(dtype=np.float32)).astype(np.int32)
    gt = np.round(nifti.load(args.gt).get_fdata(dtype=np.float32)).astype(np.int32)
    # vintage-agnostic 2025-space normalization (ET may be spelled 3 or 4
    # depending on the file's BraTS convention) so the WT/TC/ET compounds
    # compare like with like — the PARITY-documented delta from the
    # reference evaluator, which assumes its inputs were already converted
    pred = np.asarray(normalize_to_brats2025(pred)).astype(np.int32)
    gt = np.asarray(normalize_to_brats2025(gt)).astype(np.int32)
    results = evaluate_segmentation(pred, gt)
    print(json.dumps(results, indent=2))
    print(f"\nMean Dice (WT, TC, ET): {results['mean_dice']:.4f} ({results['mean_dice']*100:.2f}%)")
    return 0


def cmd_check_labels(args):
    from .viz.diagnostics import audit_labels_file, format_label_audit

    print(format_label_audit(audit_labels_file(args.input)))
    return 0


def cmd_features(args):
    from .features import run_all_steps

    run_all_steps(args.input, args.segmentation, args.output)
    print(f"feature extraction complete → {args.output}")
    return 0


def cmd_report(args):
    from .report import generate_report_from_summary, refine_report

    if args.summary:
        summary_path = Path(args.summary)
    elif args.results_folder:
        summary_path = Path(args.results_folder) / "feature_extraction" / "llm_ready_summary.json"
    else:
        raise SystemExit("report: pass --summary or --results-folder")
    with open(summary_path) as f:
        summary = json.load(f)
    report, vlog, _ = generate_report_from_summary(summary)
    if args.use_llm:
        report = refine_report(report)
    out = args.output or summary_path.parent / "radiology_report.txt"
    Path(out).write_text(report, encoding="utf-8")
    print(report)
    if vlog:
        print(f"\n[{len(vlog)} validation event(s) logged]", file=sys.stderr)
    return 0


def cmd_pdf(args):
    from .report import generate_pdf_report

    text = Path(args.report).read_text(encoding="utf-8")
    out = args.output or str(Path(args.report).with_suffix(".pdf"))
    generate_pdf_report(text, out)
    print(f"saved: {out}")
    return 0


def cmd_rag(args):
    from .rag import RagAssistant, build_vector_store, load_vector_store

    store = load_vector_store(args.store) if args.store else build_vector_store(
        knowledge_dir=args.knowledge_dir
    )
    assistant = RagAssistant(store=store)
    report_text = Path(args.report).read_text() if args.report else ""
    if args.question:
        print(assistant.answer_query(args.question, report_text))
        return 0
    if args.test:
        sample_questions = [
            "What is midline shift?",
            "What does peritumoral edema mean?",
            "Why does a tumor enhance with contrast?",
            "What is the whole tumor volume?",
            "What MRI sequences were used?",
            "What is a glioma?",
        ]
        for q in sample_questions:
            hits = store.retrieve(q, 2)
            best = hits[0]
            print(f"Q: {q}\n   → {best[0].title} (score {best[1]:.3f})")
        return 0
    assistant.interactive(report_text)
    return 0


def cmd_build_kb(args):
    from .rag import build_vector_store

    store = build_vector_store(knowledge_dir=args.knowledge_dir)
    store.save(args.output)
    print(f"embedded {len(store.docs)} documents → {args.output}")
    return 0


def cmd_serve(args):
    import threading

    from .serve import make_server

    engine = load_engine(args)
    server = make_server(engine, Path(args.root), host=args.host, port=args.port)
    if not getattr(args, "no_warmup", False):
        # compile the ensemble off the request path: a cold fullconv
        # program costs minutes of XLA compile, and the first upload would
        # otherwise sit at 'segmenting 10%' absorbing it.  Background
        # thread so the port binds immediately.
        def _warm():
            try:
                s = engine.warmup()
                print(f"engine warmup done in {s:.1f}s")
            except Exception as e:  # warmup is best-effort
                print(f"engine warmup failed (first request will compile): {e}")

        threading.Thread(target=_warm, daemon=True, name="engine-warmup").start()
    print(f"serving on http://{args.host}:{server.server_address[1]}  (root: {args.root})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


def cmd_check_env(args):
    from .utils import format_env_report, run_env_checks

    checks = run_env_checks(Path(args.checkpoints) if args.checkpoints else None)
    print(format_env_report(checks))
    return 0 if all(c["ok"] for c in checks) else 1


def cmd_rename(args):
    from .io.brats import rename_brats2025_folder

    changes = rename_brats2025_folder(args.folder, dry_run=args.dry_run)
    for old, new in changes:
        print(f"{'would rename' if args.dry_run else 'renamed'}: {old} → {new}")
    print(f"{len(changes)} file(s)")
    return 0


def cmd_visualize(args):
    from .viz import visualize_case

    written = visualize_case(args.input, args.segmentation, args.output, args.num_slices)
    for p in written:
        print(f"saved: {p}")
    return 0


def cmd_compare(args):
    from .viz import compare_segmentations

    out = compare_segmentations(args.gt, args.pred, args.output, args.background)
    print(f"saved: {out}")
    return 0


def cmd_init_config(args):
    from .utils.config import FrameworkConfig, save_config

    save_config(FrameworkConfig(), args.output)
    print(f"wrote default config → {args.output}")
    return 0


def cmd_data(args):
    """BraTS data access guide + optional local-folder audit.

    Parity with the reference's downloader helper
    (download_more_brats_data.py:13-30 — mostly a Synapse-registration
    instructions printer; BraTS data is gated and cannot be fetched
    anonymously).
    """
    if args.root:
        from .io.brats import find_cases

        # find_cases already returns only complete cases
        complete = find_cases(args.root)
        with_gt = [c for c in complete if c.seg_path]
        print(f"{args.root}: {len(complete)} complete cases, {len(with_gt)} with ground truth")
        for c in complete[:20]:
            print(f"  {c.case_id}  (gt={'yes' if c.seg_path else 'no'})")
        if len(complete) > 20:
            print(f"  ... and {len(complete) - 20} more")
        return 0
    print(
        """BraTS data is gated behind Synapse registration (no anonymous download):

1. Create an account at https://www.synapse.org
2. Request access to the BraTS challenge project:
     BraTS 2021: syn25829067      BraTS 2023+ (GLI): syn51156910
3. Accept the data-use agreement, then download the training archive
   via the web UI or the synapse CLI:
     pip install synapseclient
     synapse get -r <syn-id>
4. Point the framework at the extracted folder:
     braintpu data --root /path/to/BraTS   # audit what you have
     braintpu pipeline /path/to/BraTS/<case_folder>

Each case folder must contain the four modalities
(<case>_t1 / _t1ce / _t2 / _flair, or 2025 naming t1n/t1c/t2w/t2f —
run `braintpu rename` to convert) as .nii/.nii.gz, plus optional _seg."""
    )
    return 0


def cmd_train(args):
    import jax
    import jax.numpy as jnp

    from .io.brats import find_cases
    from .models import MODEL1_BN, MODEL2_GN_LARGE, init_params
    from .models.unet3d import AXIAL_UNET, UNetConfig
    from .train import TrainConfig, create_train_state, fit
    from .train.data import PatchSampler

    configs = {"model1": MODEL1_BN, "model2": MODEL2_GN_LARGE, "axial": AXIAL_UNET}
    cfg = configs[args.model]
    if args.patch:
        ps = tuple(int(v) for v in args.patch.split(","))
        import dataclasses

        cfg = dataclasses.replace(cfg, patch_size=ps)
    cases = [c for c in find_cases(args.data) if c.seg_path is not None]
    if not cases:
        raise SystemExit(f"no cases with _seg ground truth under {args.data}")
    print(f"training {args.model} on {len(cases)} cases, patch {cfg.patch_size}")
    augment = None
    if args.augment:
        from .train.augment import AugmentConfig

        augment = AugmentConfig()
    sampler = PatchSampler(
        cases,
        patch_size=cfg.patch_size,
        batch_size=args.batch_size,
        seed=args.seed,
        augment=augment,
    )
    tc = TrainConfig(base_lr=args.lr, max_steps=args.steps)
    state = create_train_state(init_params(cfg, jax.random.PRNGKey(args.seed)), tc)

    step_fn = None
    if getattr(args, "dp_devices", 0) and args.dp_devices > 1:
        from .parallel import make_mesh, make_sharded_train_step, shard_train_state

        devs = jax.devices()
        n = args.dp_devices
        if len(devs) < n:
            raise SystemExit(f"--dp-devices {n} but only {len(devs)} device(s)")
        if args.batch_size % n:
            raise SystemExit(
                f"--batch-size {args.batch_size} must be a multiple of "
                f"--dp-devices {n} (per-device batch sharding)"
            )
        mesh = make_mesh(devs[:n], data=n)
        state, shardings = shard_train_state(state, cfg, mesh)
        sharded = make_sharded_train_step(mesh, cfg, tc, shardings)
        # fit() passes a dropout key; the sharded step doesn't thread rng
        # (the production configs train with dropout_rate=0)
        if cfg.dropout_rate > 0:
            raise SystemExit(
                "--dp-devices training does not support dropout_rate > 0"
            )
        step_fn = lambda st, b, key: sharded(st, b)  # noqa: E731
        print(f"data-parallel training over mesh {dict(mesh.shape)}")

    def log(m):
        step = int(m["step"])
        if step % args.log_every == 0 or step == 1:
            print(f"step {step:>7}  loss {m['loss']:.4f}  |g| {m['grad_norm']:.3f}", flush=True)

    state = fit(
        state,
        iter(sampler),
        cfg,
        tc,
        num_steps=args.steps,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every,
        rng=jax.random.PRNGKey(args.seed + 1),
        step_fn=step_fn,
        on_metrics=log,
    )
    print(f"done at step {int(state.step)}; checkpoints in {args.checkpoint_dir}")
    return 0


def cmd_profile_report(args):
    from .utils.xprof import aggregate_trace, format_table

    ops = aggregate_trace(args.trace, line=args.line)
    print(format_table(ops, top=args.top))
    return 0


def cmd_convert_checkpoint(args):
    from .ckpt import convert_nnunet_tree, convert_torch_checkpoint, save_pytree_npz
    from .models import MODEL1_BN, MODEL2_GN_LARGE

    if Path(args.input).is_dir():
        # whole nnU-Net results tree (ref RESULTS_FOLDER layout,
        # run_brats2021_inference_singlethread.py:262-264) → npz fold layout
        written = convert_nnunet_tree(
            args.input,
            args.output,
            configs={"model1": MODEL1_BN, "model2": MODEL2_GN_LARGE},
            folds=[int(f) for f in args.tree_folds.split(",")] if args.tree_folds else None,
        )
        for p in written:
            print(f"  {p}")
        print(f"converted {len(written)} fold checkpoint(s) from {args.input} → {args.output}")
        return 0

    cfg = MODEL1_BN if args.config == "model1" else MODEL2_GN_LARGE
    params = convert_torch_checkpoint(args.input, cfg)
    save_pytree_npz(params, args.output)
    print(f"converted {args.input} → {args.output} ({args.config})")
    return 0


# ---------------------------------------------------------------------------


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="braintpu", description="TPU-native brain MRI analysis framework"
    )
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("pipeline", help="full case pipeline: segment → features → report → PDF")
    p.add_argument("case_folder")
    p.add_argument("more_case_folders", nargs="*",
                   help="additional case folders — runs with device/host "
                        "stage overlap (case N's features run while case "
                        "N+1 segments on device)")
    p.add_argument("--output", default="results")
    p.add_argument("--use-llm", action="store_true")
    p.add_argument("--no-pdf", action="store_true")
    p.add_argument("--config", help="FrameworkConfig JSON (overrides flag defaults)")
    _add_engine_args(p)
    p.set_defaults(fn=cmd_pipeline)

    p = sub.add_parser("init-config", help="write the default FrameworkConfig JSON")
    p.add_argument("output", nargs="?", default="braintpu.config.json")
    p.set_defaults(fn=cmd_init_config)

    p = sub.add_parser("data", help="BraTS dataset access instructions / local audit")
    p.add_argument("--root", help="audit an existing local dataset folder")
    p.set_defaults(fn=cmd_data)

    p = sub.add_parser("segment", help="ensemble segmentation only")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument(
        "--batch-cases", type=int, default=0,
        help="batch N cases through whole-volume inference together "
        "(fullconv mode only). NOT recommended on a single chip — the "
        "batched device program measured 0.58x per-case scaling at the "
        "HBM ceiling (PERF.md round-4 post-mortem); intended for "
        "case-wise sharding over a mesh via --dp-devices",
    )
    p.add_argument(
        "--dp-devices", type=int, default=0,
        help="shard each --batch-cases batch case-wise across this many "
        "devices (data-parallel mesh; fullconv mode only)",
    )
    p.add_argument(
        "--spatial-shard", action="store_true",
        help="with --dp-devices N and --mode fullconv: shard each single "
        "case's X axis across the mesh (GSPMD halo-exchange partitioning "
        "— per-chip memory and single-case latency instead of throughput)",
    )
    p.add_argument(
        "--warmup", action="store_true",
        help="compile the standard bucket before the first case",
    )
    p.add_argument(
        "--trace-dir",
        help="capture a jax.profiler device trace of the run "
        "(analyze with 'braintpu profile-report')",
    )
    # standalone segment saves BraTS-2025 labels by default so the output is
    # directly usable by `evaluate` and external BraTS tools (the pipeline
    # keeps "internal" and converts in its own stage)
    _add_engine_args(p, convention_default="brats2025")
    p.set_defaults(fn=cmd_segment)

    p = sub.add_parser("convert-labels", help="internal labels → BraTS convention")
    p.add_argument("input")
    p.add_argument("output", nargs="?")
    p.add_argument("--format", choices=["brats2025", "brats2021"], default="brats2025")
    p.set_defaults(fn=cmd_convert_labels)

    p = sub.add_parser("evaluate", help="Dice/IoU/sensitivity/specificity vs ground truth")
    p.add_argument("--pred", required=True)
    p.add_argument("--gt", required=True)
    p.set_defaults(fn=cmd_evaluate)

    p = sub.add_parser("check-labels", help="label audit of a segmentation file")
    p.add_argument("input")
    p.set_defaults(fn=cmd_check_labels)

    p = sub.add_parser("features", help="6-step radiology feature extraction")
    p.add_argument("--input", required=True)
    p.add_argument("--segmentation", required=True)
    p.add_argument("--output", required=True)
    p.set_defaults(fn=cmd_features)

    p = sub.add_parser("report", help="governed template report from llm_ready_summary.json")
    p.add_argument("--summary")
    p.add_argument("--results-folder")
    p.add_argument("--output")
    p.add_argument("--use-llm", action="store_true")
    p.set_defaults(fn=cmd_report)

    p = sub.add_parser("pdf", help="render a text report to PDF")
    p.add_argument("--report", required=True)
    p.add_argument("--output")
    p.set_defaults(fn=cmd_pdf)

    p = sub.add_parser("rag", help="educational Q&A assistant")
    p.add_argument("--report")
    p.add_argument("--question")
    p.add_argument("--store")
    p.add_argument("--knowledge-dir")
    p.add_argument("--test", action="store_true", help="run canned retrieval checks")
    p.set_defaults(fn=cmd_rag)

    p = sub.add_parser("build-kb", help="embed a knowledge base into a vector store")
    p.add_argument("--knowledge-dir")
    p.add_argument("--output", required=True)
    p.set_defaults(fn=cmd_build_kb)

    p = sub.add_parser("serve", help="REST API + web UI")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--root", default="serve_data")
    p.add_argument("--no-warmup", action="store_true",
                   help="skip the background engine compile at startup")
    _add_engine_args(p)
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("check-env", help="environment preflight checks")
    p.add_argument("--checkpoints")
    p.set_defaults(fn=cmd_check_env)

    p = sub.add_parser("rename", help="BraTS-2025 → 2021 filename conversion")
    p.add_argument("folder")
    p.add_argument("--dry-run", action="store_true")
    p.set_defaults(fn=cmd_rename)

    p = sub.add_parser("visualize", help="segmentation overlay PNGs per modality")
    p.add_argument("--input", required=True)
    p.add_argument("--segmentation", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--num-slices", type=int, default=9)
    p.set_defaults(fn=cmd_visualize)

    p = sub.add_parser("compare", help="GT vs prediction comparison grid")
    p.add_argument("--gt", required=True)
    p.add_argument("--pred", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--background", help="optional MRI for the underlay")
    p.set_defaults(fn=cmd_compare)

    p = sub.add_parser("train", help="train a U-Net on BraTS cases (checkpointed, resumable)")
    p.add_argument("--data", required=True, help="folder of BraTS cases with _seg ground truth")
    p.add_argument("--model", choices=["model1", "model2", "axial"], default="model1")
    p.add_argument("--steps", type=int, default=250000)
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--patch", help="override patch size, e.g. 128,128,128")
    p.add_argument("--augment", action="store_true", help="nnU-Net-style data augmentation")
    p.add_argument("--checkpoint-dir", default="train_ckpts")
    p.add_argument("--checkpoint-every", type=int, default=250)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--dp-devices", type=int, default=0,
        help="data-parallel training: shard the batch over this many "
        "devices (batch-size must divide evenly)",
    )
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser(
        "profile-report", help="per-op time table from a jax.profiler trace"
    )
    p.add_argument("trace", help="trace log dir (or .xplane.pb file)")
    p.add_argument("--line", default="XLA Ops", help='"XLA Ops" or "XLA Modules"')
    p.add_argument("--top", type=int, default=30)
    p.set_defaults(fn=cmd_profile_report)

    p = sub.add_parser(
        "convert-checkpoint",
        help="torch nnU-Net .model → braintpu .npz (file, or a whole "
        "nnUNet_results tree when --input is a directory)",
    )
    p.add_argument("--input", required=True, help=".model file OR nnU-Net results-tree root")
    p.add_argument("--output", required=True, help=".npz path (file mode) OR checkpoint root dir (tree mode)")
    p.add_argument("--config", choices=["model1", "model2"], default="model1",
                   help="architecture of a single .model file (ignored in tree mode)")
    p.add_argument("--tree-folds", help="tree mode: comma-separated fold subset, e.g. 0,1,2,3,4")
    p.set_defaults(fn=cmd_convert_checkpoint)

    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from .utils.compcache import enable_compilation_cache
    from .utils.tuned import apply_validated_flags

    enable_compilation_cache()  # warm restarts skip the ~60s XLA compile
    # hardware-validated Pallas flags recorded by tools/auto_capture.py;
    # must happen before the first jit trace (explicit env always wins)
    apply_validated_flags(verbose=True)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
