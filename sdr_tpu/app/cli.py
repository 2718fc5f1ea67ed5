"""Command-line interface — the framework's executable entry point.

The reference's only executable is the Qt demo (app/main.cpp:3-12,
zero CLI flags — SURVEY.md §5 "Config / flag system: No"). This CLI is
its replacement plus the config system the reference lacks:

  python -m sdr_tpu demo      # terminal loopback demo (the GUI analog)
  python -m sdr_tpu bench     # run a BASELINE.json config by name/index
  python -m sdr_tpu sweep     # Eb/N0 BER sweep with checkpoint/resume
  python -m sdr_tpu info      # devices, backends, component inventory
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _cmd_demo(args) -> int:
    from sdr_tpu.app.demo import DemoConfig, run_demo
    from sdr_tpu.core.config import Modulation

    cfg = DemoConfig(
        n_fft=args.n_fft,
        cp_len=args.cp,
        modulation=Modulation(args.mod),
        ebno_db=args.ebno,
    )
    run_demo(
        cfg,
        frames=args.frames,
        interval_ms=args.interval,
        snapshot=getattr(args, "snapshot", None),
    )
    return 0


def _apply_mimo_flag(case, args):
    """Apply --mimo/--ntx/--nrx to a benchmark case (bench and sweep).

    Per-scheme antenna defaults; non-fading cases switch to flat
    Rayleigh (a MIMO channel needs an (n_rx, n_tx) matrix) and a NONE
    equalizer becomes MMSE (spatial mux needs a linear detector)."""
    if not getattr(args, "mimo", None):
        return case
    import dataclasses

    from sdr_tpu.core.config import (
        ChannelModel as _CM,
        Equalizer as _Eq2,
        MIMOConfig,
        MIMOScheme,
    )

    scheme = MIMOScheme(args.mimo)
    n_tx = args.ntx if args.ntx else (1 if scheme == MIMOScheme.MRC else 2)
    n_rx = args.nrx if args.nrx else (
        2 if scheme == MIMOScheme.MRC
        else n_tx if scheme == MIMOScheme.SPATIAL_MUX
        else 1
    )
    ch = case.cfg.channel
    if ch.model in (_CM.AWGN, _CM.IDENTITY):
        ch = dataclasses.replace(ch, model=_CM.RAYLEIGH_FLAT)
    csi = getattr(args, "csi", "genie")
    detector = getattr(args, "detector", "linear")
    tag = f"+{scheme.value}{n_tx}x{n_rx}"
    if csi != "genie":
        tag += f"+{csi}"
    if detector != "linear":
        tag += f"+{detector}"
    return dataclasses.replace(
        case,
        name=case.name + tag,
        cfg=dataclasses.replace(
            case.cfg,
            channel=ch,
            mimo=MIMOConfig(
                scheme=scheme, n_tx=n_tx, n_rx=n_rx,
                csi=csi, detector=detector,
            ),
            equalizer=(
                case.cfg.equalizer
                if case.cfg.equalizer != _Eq2.NONE
                else _Eq2.MMSE
            ),
        ),
    )


def _run_sanity(args) -> int:
    """Replay the round-2 measurement-methodology corrections as an
    automatic check (docs/PERF.md "Measurement methodology lessons"):

    1. BATCH-AXIS SCAN before model fitting — measure the same kernel
       at batch B and 4B; if throughput has genuinely saturated the
       ratio is ~1, but a ratio well above 1 means any
       "asymptote"/serialization model fitted at B was a small-batch
       artifact (the round-2 "~20 GS/s structural asymptote" error).
    2. PROBE = WINDOW LABEL, NOT KERNEL BOUND — compare the kernel's
       implied streaming bandwidth (GS/s x 8 B/sample) against the
       strided HBM probe; the kernel exceeding the probe proves the
       probe labels the window, it does not bound compute-path
       kernels (the round-2 roofline correction).

    Prints ONE JSON line with both measurements and the two boolean
    lessons; exits 0 if the kernel still scales sanely with batch.
    """
    import jax

    from sdr_tpu.obs.autotune import tune_demod
    from sdr_tpu.obs.health import hbm_bandwidth_gbps

    b = int(getattr(args, "sanity_batch", 0) or 2048)
    n_syms = 64 if b >= 512 else 8
    backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    small = tune_demod(256, 64, batch=b, n_syms=n_syms, iters=4,
                       reps=2, backends=(backend,))[0]
    large = tune_demod(256, 64, batch=4 * b, n_syms=n_syms, iters=4,
                       reps=2, backends=(backend,))[0]
    if small.error or large.error:
        print(f"error: sanity bench failed: {small.error or large.error}",
              file=sys.stderr)
        return 2
    scaling = large.gs_per_s / max(small.gs_per_s, 1e-12)
    if scaling <= 0.8:
        # One retry before declaring a regression: a loaded host can
        # starve one of the two CPU measurements (observed as a flaky
        # CI failure under concurrent suites); a REAL batch-scaling
        # regression reproduces.
        small2 = tune_demod(256, 64, batch=b, n_syms=n_syms, iters=4,
                            reps=2, backends=(backend,))[0]
        large2 = tune_demod(256, 64, batch=4 * b, n_syms=n_syms, iters=4,
                            reps=2, backends=(backend,))[0]
        if not (small2.error or large2.error):
            scaling2 = large2.gs_per_s / max(small2.gs_per_s, 1e-12)
            if scaling2 > scaling:
                small, large, scaling = small2, large2, scaling2
    try:
        probe = float(hbm_bandwidth_gbps())
    except Exception:
        probe = -1.0
    implied_gbps = large.gs_per_s * 8.0
    out = {
        "sanity": True,
        "backend": backend,
        "batch_pair": [b, 4 * b],
        "gs_per_s": [small.gs_per_s, large.gs_per_s],
        "batch_scaling": scaling,
        # Lesson 1: if this is visibly > 1 the smaller batch was NOT
        # the asymptote — never fit ceilings without a batch scan.
        "small_batch_was_asymptote": scaling < 1.1,
        "hbm_probe_gbps": probe,
        "implied_stream_gbps": implied_gbps,
        # Lesson 2: kernel bandwidth above the probe == the probe is a
        # window label, not a bound on compute-path kernels.
        "probe_is_window_label_not_bound": implied_gbps > probe > 0,
    }
    print(json.dumps(out))
    # The hard gate: throughput must not REGRESS with batch (a real
    # regression, not window noise — 20% slack).
    return 0 if scaling > 0.8 else 1


def _cmd_bench(args) -> int:
    import jax

    from sdr_tpu.app.baseline_configs import baseline_cases, get_case
    from sdr_tpu.link.ber import ber_awgn_exact
    from sdr_tpu.core.config import ChannelModel, Equalizer

    if getattr(args, "sanity", False):
        return _run_sanity(args)

    if args.list:
        for i, c in enumerate(baseline_cases()):
            print(f"[{i}] {c.name}: {c.description}")
        return 0

    if getattr(args, "config_file", None):
        import dataclasses

        from sdr_tpu.app.baseline_configs import BaselineCase
        from sdr_tpu.core.config import link_config_from_dict

        with open(args.config_file) as f:
            case = BaselineCase(
                name=args.config_file,
                description="user config file",
                cfg=link_config_from_dict(json.load(f)),
            )
    else:
        case = get_case(args.config)
    impaired = bool(getattr(args, "cfo", 0.0) or getattr(args, "timing_offset", 0))
    if impaired and args.coded:
        print(
            "error: --coded cannot be combined with --cfo/--timing-offset "
            "(the coded link has no acquisition front-end yet)",
            file=sys.stderr,
        )
        return 2
    pn = getattr(args, "phase_noise", 0.0)
    iq_gain = getattr(args, "iq_gain", 1.0)
    iq_phase = getattr(args, "iq_phase", 0.0)
    front_end = bool(pn) or iq_gain != 1.0 or iq_phase != 0.0
    if front_end:
        import dataclasses

        from sdr_tpu.core.config import Equalizer as _Eq

        # Mixer impairments force pilot estimation (the LO's random
        # common phase and the compensator's residual direct gain are
        # unknowable to genie CSI) — same promotion as acquisition.
        tag = ("+pn" if pn else "") + (
            "+iq" if iq_gain != 1.0 or iq_phase != 0.0 else ""
        )
        case = dataclasses.replace(
            case,
            name=case.name + tag,
            cfg=dataclasses.replace(
                case.cfg,
                channel=dataclasses.replace(
                    case.cfg.channel,
                    phase_noise_std=pn,
                    iq_gain=iq_gain,
                    iq_phase_rad=iq_phase,
                ),
                pilot_spacing=case.cfg.pilot_spacing or 8,
                equalizer=(
                    case.cfg.equalizer
                    if case.cfg.equalizer != _Eq.NONE
                    else _Eq.MMSE
                ),
            ),
        )
    if impaired:
        import dataclasses

        # Acquisition mode: impairments force the blind S&C receiver
        # (link.pipeline._simulate_one_acquired) and pilot estimation.
        case = dataclasses.replace(
            case,
            name=case.name + "+acquire",
            cfg=dataclasses.replace(
                case.cfg,
                channel=dataclasses.replace(
                    case.cfg.channel,
                    cfo_subcarriers=args.cfo,
                    timing_offset=args.timing_offset,
                ),
                pilot_spacing=case.cfg.pilot_spacing or 8,
                equalizer=(
                    case.cfg.equalizer
                    if case.cfg.equalizer != Equalizer.NONE
                    else Equalizer.MMSE
                ),
            ),
        )
    if getattr(args, "estimator", None):
        import dataclasses

        from sdr_tpu.core.config import ChannelEstimator

        case = dataclasses.replace(
            case,
            cfg=dataclasses.replace(
                case.cfg, estimator=ChannelEstimator(args.estimator)
            ),
        )
    pa_ibo = getattr(args, "pa_ibo", None)
    spread = getattr(args, "dft_spread", False)
    if pa_ibo is not None or spread:
        import dataclasses

        try:
            cfg = case.cfg
            if spread:
                # An earlier acquisition/mixer promotion may have set a
                # COMB spacing; under dft_spread the spacing becomes a
                # pilot-SYMBOL period and must divide n_symbols.
                spacing = cfg.pilot_spacing
                while spacing > 1 and cfg.n_symbols % spacing:
                    spacing //= 2
                if cfg.pilot_spacing and spacing < 2:
                    print(
                        "error: no pilot-symbol period divides "
                        f"n_symbols={cfg.n_symbols}",
                        file=sys.stderr,
                    )
                    return 2
                cfg = dataclasses.replace(
                    cfg, dft_spread=True, pilot_spacing=spacing
                )
            if pa_ibo is not None:
                # The PA needs pilot estimation (Bussgang gain); promote
                # the case like the mixer impairments above. With
                # dft_spread the spacing is a SYMBOL period and must
                # divide n_symbols.
                spacing = cfg.pilot_spacing or 8
                if cfg.dft_spread:
                    while spacing > 1 and cfg.n_symbols % spacing:
                        spacing //= 2
                    if spacing < 2:
                        print(
                            "error: no pilot-symbol period divides "
                            f"n_symbols={cfg.n_symbols}",
                            file=sys.stderr,
                        )
                        return 2
                cfg = dataclasses.replace(
                    cfg,
                    channel=dataclasses.replace(
                        cfg.channel,
                        pa_ibo_db=pa_ibo,
                        pa_smoothness=getattr(args, "pa_p", 2.0),
                        pa_dpd=getattr(args, "pa_dpd", False),
                    ),
                    pilot_spacing=spacing,
                    equalizer=(
                        cfg.equalizer
                        if cfg.equalizer != Equalizer.NONE
                        else Equalizer.MMSE
                    ),
                )
        except (ValueError, NotImplementedError) as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        tag = ("+scfdma" if spread else "") + (
            f"+pa{pa_ibo:g}dB" if pa_ibo is not None else ""
        )
        case = dataclasses.replace(case, name=case.name + tag, cfg=cfg)
    try:
        case = _apply_mimo_flag(case, args)
    except (ValueError, NotImplementedError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    key = jax.random.PRNGKey(args.seed)
    if getattr(args, "mc", 0):
        from sdr_tpu.kernels.mc_pallas import supported as mc_ok
        from sdr_tpu.link.mc import make_mc_fn

        if impaired or not mc_ok(case.cfg):
            print(
                "error: --mc needs an MC-supported config (pow2 n_fft >= 128, "
                "AWGN/Rayleigh/Rician/multipath/Jakes channel, no "
                "pilots/impairments)",
                file=sys.stderr,
            )
            return 2
        errors, counted = make_mc_fn(case.cfg, iters=args.mc)(args.seed)
        errors, counted = np.asarray(errors), np.asarray(counted)
        print(
            json.dumps(
                {
                    "case": case.name + "+mc",
                    "path": "fused Monte-Carlo kernel (hardware PRNG)",
                    "iters": args.mc,
                    "bits": int(counted.sum()),
                    "bit_errors": int(errors.sum()),
                    "ber": float(errors.sum()) / float(counted.sum()),
                }
            )
        )
        return 0
    if getattr(args, "fast", False):
        if impaired or case.cfg.pilot_spacing or case.cfg.mimo is not None:
            print("error: --fast is the full-grid SISO throughput path "
                  "(no pilots, acquisition, or MIMO)", file=sys.stderr)
            return 2
        if len(jax.devices()) > 1 and case.cfg.n_channels % len(jax.devices()) == 0:
            from sdr_tpu.parallel import make_link_mesh, make_sharded_fast_fn

            mesh = make_link_mesh(1, len(jax.devices()))
            errors, counted = make_sharded_fast_fn(case.cfg, mesh)(key)
        else:
            from sdr_tpu.link.fast import make_fast_fn

            errors, counted = make_fast_fn(case.cfg)(key)
        errors = np.asarray(errors)
        counted = np.asarray(counted)
        print(
            json.dumps(
                {
                    "case": case.name + "+fast",
                    "path": "fused-kernel fast link",
                    "bits": int(counted.sum()),
                    "bit_errors": int(errors.sum()),
                    "ber": float(errors.sum()) / float(counted.sum()),
                }
            )
        )
        return 0
    if args.coded:
        rate = getattr(args, "rate", "1/2")
        if getattr(args, "code", "conv") == "ldpc":
            from sdr_tpu.link.coded import make_ldpc_fn

            errors, counted = make_ldpc_fn(
                case.cfg, rate=rate, iters=args.ldpc_iters
            )(key)
            code_desc = (
                f"QC-LDPC nb=24 Z=128 rate {rate}, offset min-sum "
                f"x{args.ldpc_iters} + interleaver"
            )
        elif getattr(args, "code", "conv") == "polar":
            from sdr_tpu.link.coded import make_polar_fn, polar_code_for

            N_pc = getattr(args, "polar_n", 256)
            L_pc = getattr(args, "polar_list", 8)
            pc = polar_code_for(rate, N_pc)
            errors, counted = make_polar_fn(
                case.cfg, rate=rate, block_len=N_pc, list_size=L_pc
            )(key)
            code_desc = (
                f"polar ({N_pc},{pc.k}) GA construction, CA-SCL-{L_pc} "
                f"+ CRC-11 + interleaver (payload {pc.payload_len}/cw)"
            )
        else:
            from sdr_tpu.link.coded import make_coded_fn

            errors, counted = make_coded_fn(case.cfg, rate=rate)(key)
            code_desc = f"conv K=7 (171,133) rate {rate} + interleaver"
        errors = np.asarray(errors)
        counted = np.asarray(counted)
        print(
            json.dumps(
                {
                    "case": case.name + "+fec",
                    "code": code_desc,
                    "info_bits": int(counted.sum()),
                    "bit_errors": int(errors.sum()),
                    "ber": float(errors.sum()) / float(counted.sum()),
                }
            )
        )
        return 0
    if case.sharded and len(jax.devices()) > 1 and not impaired:
        # Acquisition mode lives in the per-channel pipeline; impaired
        # runs take the unsharded path below.
        from sdr_tpu.parallel import make_link_mesh, make_sharded_stream_fn

        n = len(jax.devices())
        n_time = 2 if n % 2 == 0 and case.cfg.n_symbols % 2 == 0 else 1
        # Largest channel axis (within the devices left) that divides
        # the config's channel count — an awkward device count (e.g. 6
        # devices, 64 channels) shrinks the mesh instead of erroring.
        cdev = max(
            d for d in range(1, n // n_time + 1) if case.cfg.n_channels % d == 0
        )
        mesh = make_link_mesh(
            n_time, cdev, devices=jax.devices()[: n_time * cdev]
        )
        errors, counted = make_sharded_stream_fn(case.cfg, mesh)(key)
    else:
        from sdr_tpu.link.pipeline import make_simulate_fn

        res = make_simulate_fn(case.cfg)(key)
        errors, counted = res.bit_errors, res.bits_counted
    errors = np.asarray(errors)
    counted = np.asarray(counted)
    ber = float(errors.sum()) / float(counted.sum())
    out = {
        "case": case.name,
        "bits": int(counted.sum()),
        "bit_errors": int(errors.sum()),
        "ber": ber,
        "per_channel_ber": (errors / np.maximum(counted, 1)).tolist()
        if args.per_channel
        else None,
    }
    if case.cfg.channel.model == ChannelModel.AWGN:
        out["ber_theory_awgn"] = ber_awgn_exact(
            case.cfg.modulation, case.cfg.channel.ebno_db
        )
    if (
        case.cfg.mimo is not None
        and case.cfg.channel.model == ChannelModel.RAYLEIGH_FLAT
    ):
        from sdr_tpu.core.config import MIMOScheme
        from sdr_tpu.link.ber import ber_alamouti_exact, ber_mrc_exact

        if case.cfg.mimo.scheme == MIMOScheme.ALAMOUTI:
            out["ber_theory_alamouti"] = ber_alamouti_exact(
                case.cfg.modulation, case.cfg.channel.ebno_db, case.cfg.mimo.n_rx
            )
        elif case.cfg.mimo.scheme == MIMOScheme.MRC:
            out["ber_theory_mrc"] = ber_mrc_exact(
                case.cfg.modulation, case.cfg.channel.ebno_db, case.cfg.mimo.n_rx
            )
    print(json.dumps(out))
    return 0


def _cmd_sweep(args) -> int:
    import jax

    from sdr_tpu.app.baseline_configs import get_case
    from sdr_tpu.obs.sweep import ebno_sweep

    case = get_case(args.config)
    try:
        case = _apply_mimo_flag(case, args)
        if getattr(args, "dft_spread", False):
            import dataclasses

            case = dataclasses.replace(
                case,
                name=case.name + "+scfdma",
                cfg=dataclasses.replace(case.cfg, dft_spread=True),
            )
    except (ValueError, NotImplementedError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    engine = getattr(args, "engine", "pipeline")
    if engine == "mc":
        from sdr_tpu.kernels.mc_pallas import supported as mc_ok
        from sdr_tpu.link.mc import _fde_mc_supported

        # Round 4: wideband SC-FDMA rides the staged composition
        # (link.mc._mc_scfdma_wideband) — same engine contract.
        if not (mc_ok(case.cfg) or _fde_mc_supported(case.cfg)):
            print(
                "error: --engine mc needs an MC-supported config "
                "(pow2 n_fft >= 128, AWGN/Rayleigh/multipath/Jakes, no pilots)",
                file=sys.stderr,
            )
            return 2
    if engine == "fast" and (
        case.cfg.pilot_spacing
        or case.cfg.channel.impaired
        or case.cfg.mimo is not None
    ):
        print(
            "error: --engine fast needs a full-grid SISO config "
            "(no pilots, timing/CFO impairments, or MIMO)",
            file=sys.stderr,
        )
        return 2
    grid = (
        [float(x) for x in args.ebno_grid.split(",")]
        if args.ebno_grid
        else list(case.ebno_sweep_db) or [0, 2, 4, 6, 8, 10]
    )
    code = getattr(args, "code", None)
    if code is not None and engine != "pipeline":
        print(
            "error: --code sweeps use the pipeline engine",
            file=sys.stderr,
        )
        return 2
    res = ebno_sweep(
        case.cfg,
        grid,
        jax.random.PRNGKey(args.seed),
        target_errors=args.target_errors,
        max_bits=args.max_bits,
        checkpoint_path=args.checkpoint,
        engine=engine,
        mc_iters=getattr(args, "mc_iters", 16),
        code=code,
        code_rate=getattr(args, "rate", "1/2"),
        progress=lambda p: print(
            f"# ebno={p.ebno_db:5.1f} dB  ber={p.ber:.3e}  "
            f"({p.bit_errors}/{p.bits_counted})",
            file=sys.stderr,
        ),
    )
    model = case.cfg.channel.model
    kf = case.cfg.channel.k_factor
    theory = res.theory(
        case.cfg.modulation, model, k_factor=kf, mimo=case.cfg.mimo
    )
    from sdr_tpu.core.config import ChannelModel as _CM2, MIMOScheme as _MS

    if case.cfg.mimo is not None and case.cfg.mimo.scheme in (
        _MS.ALAMOUTI,
        _MS.MRC,
    ) and model == _CM2.RAYLEIGH_FLAT:
        theory_key = f"ber_theory_{case.cfg.mimo.scheme.value}"
    elif model.value.startswith("rayleigh"):
        theory_key = "ber_theory_rayleigh"
    elif model.value == "rician":
        theory_key = "ber_theory_rician"
    else:
        theory_key = "ber_theory_awgn"
    print(
        json.dumps(
            {
                "case": case.name,
                "config": res.config_summary,
                "ebno_db": res.ebnos().tolist(),
                "ber": res.bers().tolist(),
                theory_key: theory.tolist(),
            }
        )
    )
    if getattr(args, "plot", None):
        # After the results JSON — a plotting failure must never cost
        # the sweep's computed data.
        from sdr_tpu.obs.plot import plot_sweep

        plot_sweep(res, case.cfg.modulation, args.plot,
                   channel_model=model, k_factor=kf, mimo=case.cfg.mimo)
        print(f"# BER curve written to {args.plot}", file=sys.stderr)
    return 0


def _cmd_autotune(args) -> int:
    from sdr_tpu.obs.autotune import recommend_crossover, tune_fft

    if getattr(args, "demod", False):
        import dataclasses as _dc

        from sdr_tpu.obs.autotune import tune_demod

        pts = tune_demod(
            n_fft=args.demod_nfft, cp_len=args.demod_cp, iters=args.iters
        )
        ok = [p for p in pts if p.error is None]
        winner = max(ok, key=lambda p: p.gs_per_s).backend if ok else None
        be, _, stage = (winner or "").partition(":")
        env = {"SDR_TPU_DEMOD_BACKEND": be} if winner else {}
        if stage:
            env["SDR_TPU_FOURSTEP_STAGE"] = stage
        print(json.dumps({
            "recommended_demod_backend": be or None,
            "recommended_env": env,
            "points": [_dc.asdict(p) for p in pts],
        }))
        return 0

    sizes = [int(s) for s in args.sizes.split(",")]
    points = tune_fft(sizes=sizes, iters=args.iters)
    for p in points:
        print(
            f"# n={p.n:6d}  xla={p.xla_gelems:7.1f}  matmul={p.matmul_gelems:7.1f} "
            f"Gelem/s  -> {p.winner}",
            file=sys.stderr,
        )
    cross = recommend_crossover(points)
    print(
        json.dumps(
            {
                "matmul_min_n": cross,
                "points": [
                    {"n": p.n, "xla": p.xla_gelems, "matmul": p.matmul_gelems}
                    for p in points
                ],
            }
        )
    )
    return 0


def _cmd_scale(args) -> int:
    import dataclasses
    import jax

    from sdr_tpu.app.baseline_configs import get_case
    from sdr_tpu.obs.scaling import weak_scaling

    case = get_case(args.config)
    counts = [int(x) for x in args.devices.split(",")] if args.devices else None
    # Per-device channel count: shrink the case's channels to one shard.
    per_dev = max(case.cfg.n_channels // max(len(jax.devices()), 1), 1)
    cfg = dataclasses.replace(case.cfg, n_channels=per_dev)
    points = weak_scaling(cfg, device_counts=counts, iters=args.iters)
    print(
        json.dumps(
            {
                "case": case.name,
                "points": [dataclasses.asdict(p) for p in points],
            }
        )
    )
    return 0


def _cmd_waveform(args) -> int:
    """Waveform-domain report for a case: PAPR percentiles + CCDF,
    aided/blind EVM at the case's Eb/N0, Welch-PSD in-band flatness."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sdr_tpu.app.baseline_configs import get_case
    from sdr_tpu.obs.waveform import (
        evm_rms,
        papr_ccdf,
        papr_ccdf_theory,
        papr_db,
        psd_welch,
    )
    from sdr_tpu.ops import channel as chan
    from sdr_tpu.ops.modulation import modulate
    from sdr_tpu.ops.ofdm import ofdm_tx

    case = get_case(args.config)
    cfg = case.cfg
    n_fft, cp = cfg.ofdm.n_fft, cfg.ofdm.cp_len
    bps = cfg.modulation.bits_per_symbol
    n_sym = args.symbols
    grid = jnp.arange(4.0, 13.0, 0.5)
    nv = chan.ebno_db_to_noise_var(cfg.channel.ebno_db, bps)
    nseg = min(n_fft, 512)

    # One jitted program, real in / real out: the axon TPU runtime
    # cannot transfer complex arrays, so every complex intermediate
    # (constellation, waveform, noise) must live inside the jit.
    @jax.jit
    def _metrics(key):
        kb, kr, ki = jax.random.split(key, 3)
        bits = jax.random.bernoulli(
            kb, 0.5, (n_sym, n_fft * bps)
        ).astype(jnp.int8)
        points = modulate(bits, cfg.modulation)
        tx = ofdm_tx(points, cp)
        p = papr_db(tx)
        noise = jax.lax.complex(
            jax.random.normal(kr, points.shape),
            jax.random.normal(ki, points.shape),
        ) * jnp.float32((nv / 2.0) ** 0.5)
        rx = points + noise
        return (
            p,
            papr_ccdf(p, grid),
            evm_rms(rx, cfg.modulation, ref_points=points),
            evm_rms(rx, cfg.modulation),
            psd_welch(tx.reshape(-1), nperseg=nseg, overlap=nseg // 2),
        )

    p, ccdf, evm_aided, evm_blind, psd = map(
        np.asarray, _metrics(jax.random.PRNGKey(args.seed))
    )
    qs = np.percentile(p, [50.0, 99.0, 99.9])
    evm_aided, evm_blind = float(evm_aided), float(evm_blind)
    mid = psd[len(psd) // 10: -len(psd) // 10]
    out = {
        "case": case.name,
        "n_symbols": n_sym,
        "papr_db": {"p50": float(qs[0]), "p99": float(qs[1]),
                    "p99.9": float(qs[2])},
        "evm_rms_pct": {"data_aided": 100 * evm_aided, "blind": 100 * evm_blind},
        "evm_theory_pct": 100 * float(nv) ** 0.5,
        "psd_inband_flatness_db": float(10 * np.log10(mid.max() / mid.min())),
        "ccdf_grid_db": [float(g) for g in np.asarray(grid)],
        "ccdf": [float(c) for c in ccdf],
    }
    if args.plot:
        from sdr_tpu.obs.plot import plot_ber_curves

        g = np.asarray(grid)
        plot_ber_curves(
            [(f"{case.name} measured ({n_sym} symbols)", g, ccdf)],
            args.plot,
            title=f"PAPR CCDF — {cfg.modulation.value}/{n_fft}sc OFDM",
            theory=(
                f"Gaussian theory 1-(1-e^-x)^{n_fft}",
                g,
                papr_ccdf_theory(n_fft)(g),
            ),
            xlabel="PAPR [dB]",
            ylabel="Pr[PAPR > x]",
        )
        print(f"# CCDF figure written to {args.plot}", file=sys.stderr)
    print(json.dumps(out))
    return 0


def _cmd_adapt(args) -> int:
    """Calibrate the MCS ladder on this machine and (optionally) run an
    adaptive link over a shadowed SNR profile."""
    import jax

    from sdr_tpu.app.baseline_configs import get_case
    from sdr_tpu.link.adapt import calibrate, simulate_adaptive

    import dataclasses as _dc

    from sdr_tpu.core.config import ChannelEstimator
    from sdr_tpu.link.adapt import DEFAULT_LADDER, waveform_ladder

    case = get_case(args.config)
    cfg = case.cfg
    ladder = DEFAULT_LADDER
    ibo = getattr(args, "pa_ibo", None)
    if ibo is not None:
        # PA mode (round 4): the waveform becomes a ladder dimension —
        # every rung calibrates in OFDM and SC-FDMA twins under the
        # configured backoff (PA needs estimated CSI: pilots added).
        spacing = 8 if not cfg.n_symbols % 8 else 4
        cfg = _dc.replace(
            cfg,
            pilot_spacing=spacing,
            estimator=ChannelEstimator.DFT,
            channel=_dc.replace(cfg.channel, pa_ibo_db=float(ibo)),
        )
        ladder = waveform_ladder(DEFAULT_LADDER)
    key = jax.random.PRNGKey(args.seed)
    table = calibrate(cfg, key, target_ber=args.target_ber, ladder=ladder)
    out = {
        "case": case.name,
        "target_ber": args.target_ber,
        "pa_ibo_db": ibo,
        "table": [
            {
                "modulation": t.modulation.value,
                "family": t.family,
                "rate": t.rate,
                "waveform": t.waveform,
                "efficiency_bits_per_use": t.efficiency,
                "esno_threshold_db": t.esno_db,
                "measured_ber_at_threshold": t.measured_ber,
            }
            for t in table
        ],
    }
    if args.profile:
        rng = np.random.default_rng(args.seed)
        profile = args.mean_snr + args.shadowing_std * rng.standard_normal(
            cfg.n_channels
        )
        res = simulate_adaptive(cfg, key, profile, table,
                                margin_db=args.margin)
        out["adaptive"] = {
            "mean_esno_db": args.mean_snr,
            "shadowing_std_db": args.shadowing_std,
            "achieved_efficiency": res["achieved_efficiency"],
            "silent_channels": res["silent_channels"],
            "families_used": sorted(
                {f for f in res["family_per_channel"] if f}
            ),
            "waveforms_used": sorted(
                {w for w in res.get("waveform_per_channel", []) if w}
            ),
            "info_ber": float(res["bit_errors"].sum())
            / max(int(res["info_bits"].sum()), 1),
        }
    print(json.dumps(out))
    return 0


def _cmd_packet(args) -> int:
    """Packet-modem campaign: random payloads over an impaired channel
    through the blind receiver; reports PER and CRC statistics."""
    import jax

    from sdr_tpu.core.config import ChannelConfig, ChannelModel, Modulation, OFDMConfig
    from sdr_tpu.link.packet import PacketConfig, simulate_packets

    try:
        pcfg = PacketConfig(
            payload_bytes=args.payload,
            modulation=Modulation(args.mod),
            ofdm=OFDMConfig(n_fft=args.n_fft, cp_len=args.cp),
            rate=args.rate,
            pilot_spacing=args.pilots,
            fec=getattr(args, "code", "conv"),
        )
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    ch = ChannelConfig(
        model=ChannelModel(args.channel),
        ebno_db=args.ebno,
        pdp=(
            (1.0, 0.5)
            if args.channel in ("multipath", "multipath_time")
            else (1.0,)
        ),
        doppler_norm=getattr(args, "doppler", 0.01),
        cfo_subcarriers=args.cfo,
        timing_offset=args.timing_offset,
    )
    source = None
    if getattr(args, "record", None) or getattr(args, "replay", None):
        import jax.numpy as jnp

        from sdr_tpu.link.packet import (
            decode_packet,
            encode_packet,
            transmit_over_channel,
        )
        from sdr_tpu.ops.channel import ebno_db_to_noise_var

        frame = ch.timing_offset + pcfg.burst_len + pcfg.ofdm.symbol_len
        nv = float(ebno_db_to_noise_var(ch.ebno_db, pcfg.modulation.bits_per_symbol))
        key = jax.random.PRNGKey(args.seed)

        def _payload(i):
            k = jax.random.fold_in(key, i)
            return np.asarray(jax.random.randint(
                k, (pcfg.payload_bytes,), 0, 256, jnp.int32
            ), np.int32).astype(np.uint8), k

        if args.record:
            # Real-valued outputs only: the axon TPU runtime cannot
            # transfer complex arrays to the host for recording.
            @jax.jit
            def _one_stream(k, payload):
                s, _ = transmit_over_channel(
                    pcfg, ch, k, encode_packet(pcfg, payload)
                )
                return jnp.real(s), jnp.imag(s)

            chunks = []
            for i in range(args.n):
                payload, k = _payload(i)
                re, im = _one_stream(k, jnp.asarray(payload))
                s = np.empty(frame, np.complex64)
                s.real, s.imag = np.asarray(re), np.asarray(im)
                chunks.append(s)
            from sdr_tpu.native.iq import write_iq

            write_iq(args.record, np.concatenate(chunks))
            print(f"# recorded {args.n} bursts ({frame} samples each) "
                  f"to {args.record}", file=sys.stderr)
        path = args.replay or args.record
        from sdr_tpu.native.iq import IQReader

        dec = jax.jit(
            lambda re, im: decode_packet(pcfg, jax.lax.complex(re, im), nv)
        )
        errs, oks = [], []
        try:
            rd = IQReader(path, frame=frame)
        except OSError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        with rd:
            for i in range(args.n):
                nxt = rd.next_real()
                if nxt is None:
                    break
                rx, ok = dec(jnp.asarray(nxt[0]), jnp.asarray(nxt[1]))
                expected, _ = _payload(i)
                errs.append(int((np.asarray(rx) != expected).sum()))
                oks.append(bool(ok))
        if not errs:
            print(
                f"error: no {frame}-sample frames in {path} (wrong file, "
                "or recorded with different packet/channel settings)",
                file=sys.stderr,
            )
            return 2
        byte_errs, crc_ok = np.asarray(errs), np.asarray(oks)
        source = f"iq_file:{path}"
        args.n = len(errs)
    else:
        byte_errs, crc_ok = simulate_packets(
            pcfg, ch, jax.random.PRNGKey(args.seed), args.n
        )
        byte_errs = np.asarray(byte_errs)
        crc_ok = np.asarray(crc_ok)
    print(json.dumps({
        "source": source or "simulated",
        "payload_bytes": pcfg.payload_bytes,
        "modulation": pcfg.modulation.value,
        "rate": pcfg.rate,
        "n_symbols": pcfg.n_symbols,
        "burst_samples": pcfg.burst_len,
        "channel": ch.model.value,
        "ebno_db": ch.ebno_db,
        "cfo_subcarriers": ch.cfo_subcarriers,
        "timing_offset": ch.timing_offset,
        "packets": int(args.n),
        "per": float((byte_errs > 0).mean()),
        "crc_ok_rate": float(crc_ok.mean()),
        "crc_verdicts_consistent": bool(
            (crc_ok == (byte_errs == 0)).all()
        ),
        "byte_error_rate": float(byte_errs.sum())
        / float(args.n * pcfg.payload_bytes),
    }))
    return 0


def _cmd_info(args) -> int:
    import jax

    from sdr_tpu.core.config import Modulation
    from sdr_tpu.ops.fft import get_default_backend

    info = {
        "version": "0.2",
        "jax_backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
        "fft_backend": get_default_backend(),
        "modulations": [m.value for m in Modulation],
        "demod_backends": ["jnp", "pallas (n_fft<=512)",
                           "fourstep (n_fft>=1024)", "hybrid"],
        "channels": ["identity", "awgn", "rayleigh_flat", "rician (K-factor)",
                     "multipath", "rayleigh_time (Jakes)",
                     "rx LO phase noise (Wiener walk)"],
        "receiver": ["ZF/MMSE equalizers", "max-log LLR",
                     "comb pilots (LS / per-symbol / phase-tracked / "
                     "DFT-subspace)",
                     "blind acquisition (S&C + integer CFO + fine timing)",
                     "blind I/Q-image cancellation (properization)"],
        "mimo": ["Alamouti G2 STBC", "receive MRC",
                 "spatial mux (ZF / MMSE / max-log joint ML)",
                 "genie or time-orthogonal-preamble CSI",
                 "composes with FEC and channel DP"],
        "waveforms": ["CP-OFDM",
                      "SC-FDMA / DFT-spread (block ZC pilots, SC-FDE "
                      "on every engine, composes with all impairments "
                      "and MIMO)"],
        "fec": ["conv K=7 (171,133)", "rates 1/2, 2/3, 3/4 (802.11a "
                "puncturing)", "soft Viterbi", "block interleaver",
                "QC-LDPC (nb=24, Z=128) + offset min-sum (fused kernel)",
                "CA-polar (GA construction, CRC-11, SC-list decode)",
                "mixed-family adaptive MCS ladder",
                "packet modem carries any family"],
        "parallelism": ["channel DP", "time-block SP (ppermute halos)",
                        "subcarrier TP (four-step all_to_all)",
                        "2-stage PP (microbatched)",
                        "fused kernels under shard_map",
                        "multi-process jax.distributed"],
        "observability": ["JSONL metrics", "profiler traces", "health probe",
                          "checkpointed sweeps + BER figures",
                          "waveform PAPR/EVM/PSD report"],
    }
    print(json.dumps(info, indent=2))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="sdr_tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("demo", help="terminal loopback demo")
    d.add_argument("--frames", type=int, default=100)
    d.add_argument("--interval", type=float, default=50.0, help="ms per frame")
    d.add_argument("--n-fft", type=int, default=8)
    d.add_argument("--cp", type=int, default=8)
    d.add_argument("--mod", default="16qam")
    d.add_argument("--ebno", type=float, default=None, help="AWGN Eb/N0 dB (default: identity loopback)")
    d.add_argument("--snapshot", default=None,
                   help="write the final time/constellation views to a figure (PNG/SVG)")
    d.set_defaults(fn=_cmd_demo)

    b = sub.add_parser("bench", help="run a BASELINE config")
    b.add_argument("--config", default="0", help="case name or index 0-4")
    b.add_argument("--config-file", default=None,
                   help="JSON LinkConfig file (overrides --config)")
    b.add_argument("--list", action="store_true")
    b.add_argument("--seed", type=int, default=0)
    b.add_argument("--per-channel", action="store_true")
    b.add_argument(
        "--cfo", type=float, default=0.0,
        help="carrier frequency offset in subcarrier spacings (enables "
        "blind acquisition: S&C preamble + CFO recovery + fine timing)",
    )
    b.add_argument(
        "--timing-offset", type=int, default=0,
        help="unknown frame delay in samples (enables blind acquisition)",
    )
    b.add_argument(
        "--phase-noise", type=float, default=0.0, metavar="STD",
        help="RX-LO Wiener phase noise, per-sample increment std in rad "
        "(enables comb pilots with per-symbol phase tracking)",
    )
    b.add_argument(
        "--iq-gain", type=float, default=1.0, metavar="G",
        help="RX I/Q amplitude mismatch ratio (1 = matched; enables the "
        "blind properization compensator + comb pilots)",
    )
    b.add_argument(
        "--iq-phase", type=float, default=0.0, metavar="RAD",
        help="RX I/Q phase skew in radians (0 = matched)",
    )
    b.add_argument(
        "--estimator", default=None, choices=["ls", "dft"],
        help="pilot channel-estimation backend (dft = CP-subspace "
        "denoising; only meaningful with a pilot config)",
    )
    b.add_argument(
        "--mimo", default=None, choices=["alamouti", "mrc", "mux"],
        help="multi-antenna mode (ops.mimo): Alamouti 2-TX STBC, "
        "receive MRC, or spatial multiplexing with linear ZF/MMSE; "
        "non-fading cases switch to flat Rayleigh (genie CSI)",
    )
    b.add_argument(
        "--ntx", type=int, default=0, metavar="N",
        help="TX antennas (default: per-scheme — 2 STBC/mux, 1 MRC)",
    )
    b.add_argument(
        "--nrx", type=int, default=0, metavar="N",
        help="RX antennas (default: per-scheme — 1 STBC, 2 MRC, ntx mux)",
    )
    b.add_argument(
        "--csi", default="genie", choices=["genie", "preamble"],
        help="MIMO receiver CSI: perfect, or estimated from n_tx "
        "time-orthogonal pilot symbols (LS; --estimator dft denoises)",
    )
    b.add_argument(
        "--detector", default="linear", choices=["linear", "sic", "ml"],
        help="spatial-mux detector: linear (ZF/MMSE per the case "
        "equalizer) or max-log joint ML (optimal, full diversity)",
    )
    b.add_argument(
        "--coded", action="store_true",
        help="run the FEC-coded link (conv K=7 + soft Viterbi) over the case",
    )
    b.add_argument(
        "--rate", default="1/2", choices=["1/2", "2/3", "3/4"],
        help="FEC code rate via 802.11a puncturing (with --coded)",
    )
    b.add_argument(
        "--code", default="conv", choices=["conv", "ldpc", "polar"],
        help="FEC family for --coded: convolutional+Viterbi, "
             "QC-LDPC+min-sum, or polar+CA-SCL (rates via --rate on any)",
    )
    b.add_argument(
        "--ldpc-iters", type=int, default=25,
        help="min-sum iterations for --code ldpc",
    )
    b.add_argument(
        "--polar-n", type=int, default=256,
        help="polar block length (power of 2, with --code polar)",
    )
    b.add_argument(
        "--polar-list", type=int, default=8,
        help="CA-SCL list size (with --code polar)",
    )
    b.add_argument(
        "--sanity", action="store_true",
        help="replay the measurement-methodology checks (batch-axis "
        "scaling + probe-vs-kernel bandwidth) and print one JSON line",
    )
    b.add_argument(
        "--sanity-batch", type=int, default=0,
        help="base batch for --sanity (default 2048; the check runs "
        "the pair [B, 4B])",
    )
    b.add_argument(
        "--pa-ibo", type=float, default=None, metavar="DB",
        help="TX Rapp PA input backoff in dB (promotes the case to "
        "pilot estimation — the estimate absorbs the Bussgang gain)",
    )
    b.add_argument(
        "--pa-p", type=float, default=2.0,
        help="Rapp smoothness p (with --pa-ibo; large p = hard limiter)",
    )
    b.add_argument(
        "--pa-dpd", action="store_true",
        help="ideal digital predistortion ahead of the PA (with --pa-ibo)",
    )
    b.add_argument(
        "--dft-spread", action="store_true",
        help="SC-FDMA waveform: DFT-precode the data (low-PAPR, the "
        "PA-friendly uplink choice); pilots become time-multiplexed "
        "Zadoff-Chu symbols",
    )
    b.add_argument(
        "--fast", action="store_true",
        help="run the fused-kernel throughput path (link.fast; sharded "
        "over all devices when the channel count divides)",
    )
    b.add_argument(
        "--mc", type=int, default=0, metavar="ITERS",
        help="run ITERS passes of the fully-fused Monte-Carlo kernel "
        "(on-core hardware PRNG; statistical path, TPU only)",
    )
    b.set_defaults(fn=_cmd_bench)

    s = sub.add_parser("sweep", help="Eb/N0 BER sweep")
    s.add_argument("--config", default="1")
    s.add_argument("--ebno-grid", default=None, help="comma-separated dB list")
    s.add_argument("--target-errors", type=int, default=500)
    s.add_argument("--max-bits", type=int, default=20_000_000)
    s.add_argument("--checkpoint", default=None, help="JSON checkpoint path (resume)")
    s.add_argument("--plot", default=None, help="write a BER-curve figure (PNG/SVG path)")
    s.add_argument("--seed", type=int, default=0)
    s.add_argument(
        "--engine", default="pipeline", choices=["pipeline", "fast", "mc"],
        help="fast = fused-kernel link (full-grid configs, "
        "jax.random stream); mc = fully-fused Monte-Carlo kernel "
        "(hardware PRNG, TPU only; orders faster per bit)",
    )
    s.add_argument(
        "--dft-spread", action="store_true",
        help="sweep the SC-FDMA waveform (full-grid on fast/mc "
        "engines — SC-FDE receive; block pilots on pipeline)",
    )
    s.add_argument(
        "--code", default=None, choices=["conv", "ldpc", "polar"],
        help="CODED BER sweep: count decoded info bits through the "
        "chosen FEC family (pipeline engine only)",
    )
    s.add_argument(
        "--rate", default="1/2", choices=["1/2", "2/3", "3/4"],
        help="FEC rate for --code",
    )
    s.add_argument(
        "--mimo", default=None, choices=["alamouti", "mrc", "mux"],
        help="multi-antenna sweep (exact diversity theory overlay for "
        "alamouti/mrc over flat Rayleigh)",
    )
    s.add_argument("--ntx", type=int, default=0, metavar="N")
    s.add_argument("--nrx", type=int, default=0, metavar="N")
    s.add_argument("--csi", default="genie", choices=["genie", "preamble"])
    s.add_argument("--detector", default="linear", choices=["linear", "sic", "ml"])
    s.add_argument("--mc-iters", type=int, default=16,
                   help="MC kernel passes per sweep invocation")
    s.set_defaults(fn=_cmd_sweep)

    i = sub.add_parser("info", help="environment and inventory")
    i.set_defaults(fn=_cmd_info)

    ad = sub.add_parser(
        "adapt", help="calibrate MCS thresholds; optional adaptive run"
    )
    ad.add_argument("--config", default="0", help="numerology template case")
    ad.add_argument("--target-ber", type=float, default=1e-4)
    ad.add_argument("--seed", type=int, default=0)
    ad.add_argument("--profile", action="store_true",
                    help="also run an adaptive link over a lognormal-"
                    "shadowed SNR profile")
    ad.add_argument("--mean-snr", type=float, default=12.0, metavar="DB")
    ad.add_argument("--pa-ibo", type=float, default=None, metavar="DB",
                    help="enable a Rapp PA at this input backoff; the "
                         "ladder gains the OFDM/SC-FDMA waveform "
                         "dimension (round 4)")
    ad.add_argument("--shadowing-std", type=float, default=6.0, metavar="DB")
    ad.add_argument("--margin", type=float, default=0.0,
                    help="selection backoff margin in dB")
    ad.set_defaults(fn=_cmd_adapt)

    pk = sub.add_parser(
        "packet", help="bytes-over-the-air packet modem campaign (PER)"
    )
    pk.add_argument("--payload", type=int, default=64, help="bytes per packet")
    pk.add_argument("--mod", default="qpsk")
    pk.add_argument("--n-fft", type=int, default=64)
    pk.add_argument("--cp", type=int, default=16)
    pk.add_argument("--rate", default="1/2", choices=["1/2", "2/3", "3/4"])
    pk.add_argument(
        "--code", default="conv", choices=["conv", "ldpc", "polar"],
        help="packet FEC family (LDPC bursts quantize up to the "
        "3072-bit codeword)",
    )
    pk.add_argument("--pilots", type=int, default=8, help="comb pilot spacing")
    pk.add_argument(
        "--channel", default="multipath",
        choices=["awgn", "rayleigh_flat", "rician", "multipath",
                 "multipath_time"],
    )
    pk.add_argument("--doppler", type=float, default=0.01,
                    help="normalized Doppler fd*T_sym (multipath_time)")
    pk.add_argument("--ebno", type=float, default=14.0)
    pk.add_argument("--cfo", type=float, default=1.3,
                    help="carrier offset in subcarriers (blind-recovered)")
    pk.add_argument("--timing-offset", type=int, default=37,
                    help="unknown burst delay in samples")
    pk.add_argument("--n", type=int, default=100, help="packets to send")
    pk.add_argument("--seed", type=int, default=0)
    pk.add_argument(
        "--record", default=None, metavar="FILE.sc16",
        help="record the impaired bursts to a raw int16 IQ file via the "
        "native runtime, then decode them back from disk",
    )
    pk.add_argument(
        "--replay", default=None, metavar="FILE.sc16",
        help="decode packets from a previously recorded IQ file "
        "(same --seed/--n regenerate the expected payloads)",
    )
    pk.set_defaults(fn=_cmd_packet)

    wf = sub.add_parser(
        "waveform", help="PAPR/EVM/PSD waveform report for a case"
    )
    wf.add_argument("--config", default="2", help="case name or index 0-4")
    wf.add_argument("--symbols", type=int, default=4096)
    wf.add_argument("--seed", type=int, default=0)
    wf.add_argument("--plot", default=None,
                    help="write a PAPR-CCDF figure (PNG/SVG path)")
    wf.set_defaults(fn=_cmd_waveform)

    a = sub.add_parser("autotune", help="measure FFT backend crossover on this device")
    a.add_argument("--sizes", default="128,256,512,1024,2048,4096,8192,16384")
    a.add_argument("--iters", type=int, default=20)
    a.add_argument("--demod", action="store_true",
                   help="A/B the demod backends instead of the FFT backends")
    a.add_argument("--demod-nfft", type=int, default=4096)
    a.add_argument("--demod-cp", type=int, default=512)
    a.set_defaults(fn=_cmd_autotune)

    w = sub.add_parser("scale", help="weak-scaling samples/s over the device mesh")
    w.add_argument("--config", default="3")
    w.add_argument("--devices", default=None, help="comma list, e.g. 1,2,4,8")
    w.add_argument("--iters", type=int, default=10)
    w.set_defaults(fn=_cmd_scale)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
