"""CLI end-to-end tests (in-process main())."""

import numpy as np

from nbody_tpu.cli import main


def test_version(capsys):
    assert main(["--version"]) == 0
    assert "nbody_tpu" in capsys.readouterr().out


def test_benchmark_mode(capsys):
    rc = main(["--benchmark", "--numbodies", "512", "-i", "2", "--kernel", "xla",
               "--no-cycle"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "billion interactions per second" in out
    assert "GFLOP/s at 20 flops per interaction" in out


def test_qatest_mode(capsys):
    rc = main(["--qatest", "--numbodies", "256", "--kernel", "xla"])
    assert rc == 0
    assert "OK" in capsys.readouterr().out


def test_demo_mode_with_energy(capsys):
    rc = main(["--numbodies", "256", "--frames", "3", "--kernel", "xla",
               "--no-cycle", "--energy"])
    assert rc == 0
    assert "energy:" in capsys.readouterr().out


def test_demo_preset_selection(capsys):
    rc = main(["--numbodies", "256", "--frames", "1", "--kernel", "xla",
               "--no-cycle", "--demo", "4", "--config", "expand"])
    assert rc == 0


def test_render_writes_frames(tmp_path, capsys):
    rc = main([
        "--numbodies", "128", "--frames", "2", "--kernel", "xla", "--no-cycle",
        "--render", "--outdir", str(tmp_path / "f"), "--width", "64",
        "--height", "48",
    ])
    assert rc == 0
    frames = sorted((tmp_path / "f").glob("*.png"))
    assert len(frames) == 2
    assert frames[0].read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"


def test_checkpoint_save_load_cycle(tmp_path, capsys):
    ck = tmp_path / "state.npz"
    rc = main(["--numbodies", "128", "--frames", "2", "--kernel", "xla",
               "--no-cycle", "--checkpoint-save", str(ck)])
    assert rc == 0
    assert ck.exists()
    rc = main(["--frames", "1", "--kernel", "xla", "--no-cycle",
               "--checkpoint-load", str(ck)])
    assert rc == 0
    assert "Resumed" in capsys.readouterr().out


def test_tipsy_load(tmp_path, capsys):
    from nbody_tpu.io import write_tipsy_file

    rng = np.random.default_rng(0)
    path = tmp_path / "g.tipsy"
    write_tipsy_file(path, rng.normal(size=(100, 4)), rng.normal(size=(100, 4)))
    rc = main(["--tipsy", str(path), "--frames", "1", "--kernel", "xla",
               "--no-cycle"])
    assert rc == 0
    assert "Read 256 bodies" in capsys.readouterr().out


def test_devices_mesh(capsys):
    rc = main(["--numbodies", "256", "--frames", "1", "--kernel", "xla",
               "--no-cycle", "--devices", "8", "--strategy", "ring"])
    assert rc == 0


def test_devices_mesh_sym_strategy(capsys):
    """--strategy sym (each global pair once across the mesh) through the
    full CLI demo path on the 8-device virtual mesh."""
    rc = main(["--numbodies", "256", "--frames", "1", "--kernel", "pallas",
               "--no-cycle", "--devices", "8", "--strategy", "sym"])
    assert rc == 0


def test_devices_mesh_sym_hermite(capsys):
    """--strategy sym + hermite (sharded symmetric accel+jerk) through
    the full CLI demo path on the 8-device virtual mesh."""
    rc = main(["--numbodies", "256", "--frames", "1", "--kernel", "pallas",
               "--no-cycle", "--devices", "8", "--strategy", "sym",
               "--integrator", "hermite"])
    assert rc == 0


def test_sym_strategy_validations(capsys):
    import sys

    for argv, frag in (
        (["--devices", "2", "--strategy", "sym", "--kernel", "pm"],
         "pallas"),
        (["--devices", "4", "--strategy", "sym", "--mesh-rows", "2"],
         "1-D body mesh"),
        (["--devices", "2", "--strategy", "sym", "--fp64"], "float32"),
        (["--devices", "2", "--strategy", "sym"], "--kernel pallas"),
    ):
        rc = main(["--numbodies", "256", "--frames", "1", "--no-cycle",
                   *argv])
        assert rc == 1, argv
        assert frag in capsys.readouterr().err


def test_set_params(capsys):
    rc = main(["--numbodies", "128", "--frames", "1", "--kernel", "xla",
               "--no-cycle", "--set", "softening_factor=0.5,velocity_damping=0.9"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "softening_factor" in out


def test_set_params_bad_format_exits_2(capsys):
    rc = main(["--numbodies", "128", "--frames", "1", "--kernel", "xla",
               "--no-cycle", "--set", "softening"])
    assert rc == 2


def test_set_params_unknown_name_exits_2(capsys):
    rc = main(["--numbodies", "128", "--frames", "1", "--kernel", "xla",
               "--no-cycle", "--set", "warp=9"])
    assert rc == 2


def test_print_params(capsys):
    rc = main(["--numbodies", "128", "--frames", "1", "--kernel", "xla",
               "--no-cycle", "--print-params"])
    assert rc == 0
    assert "{" in capsys.readouterr().out


def test_interactive_quit_via_stdin(tmp_path, capsys, monkeypatch):
    import io

    import jax

    monkeypatch.setattr("sys.stdin", io.StringIO("q"))
    try:
        rc = main(["--numbodies", "128", "--frames", "50", "--kernel", "xla",
                   "--no-cycle", "--interactive"])
    finally:
        # --interactive enables x64 process-wide; undo for the other tests
        jax.config.update("jax_enable_x64", False)
    assert rc == 0
    assert "quit" in capsys.readouterr().out


def test_interactive_runtime_precision_toggle(capsys, monkeypatch):
    """Enter mid-loop switches fp32->fp64 with no pre-set env (the reference's
    free runtime precision switch, compute_cuda.cpp:152-181): --interactive
    turns x64 on at process start so the toggle is always available."""
    import io

    import jax

    monkeypatch.setattr("sys.stdin", io.StringIO("\nq"))
    try:
        rc = main(["--numbodies", "128", "--frames", "50", "--kernel", "xla",
                   "--no-cycle", "--interactive"])
    finally:
        jax.config.update("jax_enable_x64", False)
    assert rc == 0
    out = capsys.readouterr().out
    assert "precision: fp64" in out
    assert "quit" in out


def test_render_writes_metadata_and_hud(tmp_path):
    rc = main([
        "--numbodies", "128", "--frames", "1", "--kernel", "xla", "--no-cycle",
        "--render", "--outdir", str(tmp_path / "f"), "--width", "64",
        "--height", "48",
    ])
    assert rc == 0
    import json

    meta = json.loads((tmp_path / "f" / "metadata.json").read_text())
    assert meta["num_bodies"] == 128
    assert meta["resolution"] == [64, 48]


def test_missing_tipsy_file_exits_2(capsys):
    rc = main(["--tipsy", "/nonexistent/file.bin", "--frames", "1",
               "--kernel", "xla", "--no-cycle"])
    assert rc == 2


def test_hostmem(capsys):
    rc = main(["--numbodies", "128", "--frames", "1", "--kernel", "xla",
               "--no-cycle", "--hostmem"])
    assert rc == 0
    assert "host memory" in capsys.readouterr().out


def test_selftest(capsys):
    rc = main(["--selftest", "--numbodies", "256", "--kernel", "xla",
               "--no-cycle"])
    assert rc == 0
    assert "selftest PASSED" in capsys.readouterr().out


def test_drift_check_mesh_solver_not_gated(capsys):
    """--drift-check with pm/p3m reports but must NOT fail the exit-code
    ladder: the mesh solvers differ from the all-pairs oracle by design
    (cell-scale effective softening)."""
    from nbody_tpu.cli import main

    rc = main(["--cpu", "--kernel", "pm", "--numbodies", "512",
               "--pm-grid", "16", "--drift-check", "2", "--seed", "3"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "by design" in out


def test_mesh_rows_rejects_mesh_solvers(capsys):
    from nbody_tpu.cli import main

    rc = main(["--devices", "4", "--mesh-rows", "2", "--kernel", "p3m",
               "--numbodies", "256", "--frames", "1"])
    assert rc == 1
    err = capsys.readouterr().err
    assert "error:" in err and "1-D body mesh" in err


def test_mesh_rows_rejects_mxu_variant(capsys):
    from nbody_tpu.cli import main

    rc = main(["--devices", "4", "--mesh-rows", "2", "--variant", "mxu_bf16",
               "--numbodies", "256", "--frames", "1"])
    assert rc == 1
    assert "error:" in capsys.readouterr().err


def test_adaptive_dt_demo(capsys):
    rc = main(["--numbodies", "256", "--frames", "3", "--kernel", "xla",
               "--no-cycle", "--adaptive-dt", "0.01", "--energy",
               "--steps-per-frame", "4"])
    assert rc == 0
    assert "energy:" in capsys.readouterr().out


def test_adaptive_dt_rejects_fixed_dt_modes(capsys):
    # (--devices N --kernel pm/p3m is no longer here: the mesh solvers
    # got their sharded adaptive rollout in r5 — tested in
    # tests/test_adaptive.py::test_sharded_mesh_solver_adaptive_*)
    for extra in (["--benchmark"], ["--qatest"], ["--drift-check", "10"],
                  ["--selftest"],
                  ["--devices", "2", "--strategy", "ring_fused"]):
        rc = main(["--numbodies", "512", "--kernel", "xla",
                   "--adaptive-dt", *extra])
        assert rc == 1, extra
        assert "error:" in capsys.readouterr().err
    # ds: adaptive is a demo-mode option — measurement modes reject it
    # (meshes are fine: make_sharded_ds_adaptive_rollout covers
    # --precision ds --devices N --adaptive-dt, tested below)
    for extra in (["--benchmark"],):
        rc = main(["--numbodies", "256", "--precision", "ds",
                   "--adaptive-dt", *extra])
        assert rc == 1, extra
        assert "error:" in capsys.readouterr().err


def test_precision_ds_demo_render_checkpoint_resume(tmp_path, capsys):
    """The VERDICT r3 item-2 'done' shape: a ds demo run renders frames
    and writes a checkpoint, and a resumed ds run continues
    BIT-IDENTICALLY (ds state round-trips exactly through the f64
    checkpoint)."""
    import numpy as np

    from nbody_tpu.io import load_checkpoint

    ck = tmp_path / "ds.npz"
    out = tmp_path / "frames"
    rc = main(["--precision", "ds", "--config", "plummer",
               "--numbodies", "128", "--frames", "2", "--no-cycle",
               "--render", "--outdir", str(out),
               "--checkpoint-save", str(ck),
               "--width", "64", "--height", "48"])
    assert rc == 0
    assert (out / "frame_00000.png").exists()
    assert "ds (fp64-grade)" in capsys.readouterr().out

    a, b = tmp_path / "a.npz", tmp_path / "b.npz"
    rc = main(["--precision", "ds", "--config", "plummer",
               "--numbodies", "128", "--frames", "4", "--no-cycle",
               "--checkpoint-save", str(a)])
    assert rc == 0
    rc = main(["--precision", "ds", "--numbodies", "128", "--frames", "2",
               "--no-cycle", "--checkpoint-load", str(ck),
               "--checkpoint-save", str(b)])
    assert rc == 0
    pa, va, _, ma = load_checkpoint(str(a))
    pb, vb, _, mb = load_checkpoint(str(b))
    assert ma["step"] == mb["step"] == 4
    assert np.array_equal(pa, pb) and np.array_equal(va, vb)


def test_precision_ds_mesh_demo(capsys):
    """--precision ds --devices N: the sharded ds step through the full
    CLI demo path on the virtual mesh."""
    rc = main(["--precision", "ds", "--numbodies", "256", "--frames", "1",
               "--no-cycle", "--devices", "8"])
    assert rc == 0
    assert "8-device" in capsys.readouterr().out


def test_precision_ds_mesh_ring_demo(capsys):
    """--precision ds --devices N --strategy ring: the rotating-j-planes
    ds decomposition through the full CLI demo path."""
    rc = main(["--precision", "ds", "--numbodies", "256", "--frames", "1",
               "--no-cycle", "--devices", "8", "--strategy", "ring"])
    assert rc == 0
    assert "8-device" in capsys.readouterr().out


def test_precision_ds_adaptive_demo(capsys):
    rc = main(["--precision", "ds", "--numbodies", "128", "--frames", "2",
               "--no-cycle", "--adaptive-dt", "0.02"])
    assert rc == 0


def test_precision_ds_mesh_adaptive_demo(capsys):
    """--precision ds --devices N --adaptive-dt: the sharded ds ADAPTIVE
    rollout through the full CLI demo path (the last empty cell of the
    adaptive x precision x mesh matrix)."""
    rc = main(["--precision", "ds", "--numbodies", "128", "--frames", "2",
               "--no-cycle", "--devices", "8", "--adaptive-dt", "0.02"])
    assert rc == 0
    assert "8-device" in capsys.readouterr().out


def test_precision_ds_2d_mesh_demo(capsys):
    """--precision ds --devices N --mesh-rows R: the 2-D rows×cols ds
    decomposition (plane gathers along both axes + the anchored ds
    reduce-scatter over cols) through the full CLI demo path (r5
    item 5)."""
    rc = main(["--precision", "ds", "--numbodies", "256", "--frames", "1",
               "--no-cycle", "--devices", "8", "--mesh-rows", "2"])
    assert rc == 0
    assert "2x4 2-D mesh" in capsys.readouterr().out


def test_precision_ds_2d_mesh_adaptive_demo(capsys):
    """--precision ds --devices N --mesh-rows R --adaptive-dt: the 2-D
    ds ADAPTIVE rollout (f32 criterion psum'd over cols, ds step from
    the traced-dt scal rebuild) through the full CLI demo path."""
    rc = main(["--precision", "ds", "--numbodies", "128", "--frames", "2",
               "--no-cycle", "--devices", "8", "--mesh-rows", "2",
               "--adaptive-dt", "0.02"])
    assert rc == 0
    assert "2x4 2-D mesh" in capsys.readouterr().out


def test_precision_ds_demo_gates(capsys):
    for argv, frag in (
        (["--hostmem"], "device"),
        (["--kernel", "pm"], "auto/pallas"),
        (["--devices", "4", "--mesh-rows", "2", "--strategy", "ring"],
         "leave --strategy auto"),
        (["--devices", "2", "--strategy", "ring_fused"], "allgather/ring"),
        (["--variant", "mxu"], "auto/sym"),
        (["--selftest"], "fp32/fp64"),
        (["--fp64"], "exclusive"),
    ):
        rc = main(["--precision", "ds", "--numbodies", "128",
                   "--frames", "1", "--no-cycle", *argv])
        assert rc == 1, argv
        assert frag in capsys.readouterr().err, argv


def test_adaptive_dt_sharded_demo(capsys):
    rc = main(["--numbodies", "512", "--frames", "2", "--kernel", "xla",
               "--no-cycle", "--adaptive-dt", "0.01", "--devices", "8",
               "--steps-per-frame", "4"])
    assert rc == 0


def test_adaptive_dt_sym_strategy_demo(capsys):
    """--adaptive-dt --devices N --strategy sym: the flagship Newton's-
    third-law kernels under the adaptive global-dt scan (r5 item 1 —
    the last cell of the adaptive x strategy matrix)."""
    rc = main(["--numbodies", "512", "--frames", "2", "--kernel", "pallas",
               "--no-cycle", "--adaptive-dt", "0.01", "--devices", "8",
               "--strategy", "sym", "--steps-per-frame", "2"])
    assert rc == 0


def test_adaptive_dt_p3m_mesh_demo(capsys):
    """--kernel p3m --adaptive-dt --devices N: the mesh-solver adaptive
    rollout (jit-level scan over the shard_map'd P3M force, probe
    carried through the scan — r5 item 2)."""
    rc = main(["--numbodies", "512", "--frames", "2", "--kernel", "p3m",
               "--pm-grid", "16", "--no-cycle", "--adaptive-dt", "0.01",
               "--devices", "8", "--steps-per-frame", "2"])
    assert rc == 0


def test_adaptive_dt_2d_mesh_demo(capsys):
    """--adaptive-dt over the 2-D decomposition: the dt criterion
    pmax-reduces over BOTH mesh axes (VERDICT r3 item 5)."""
    rc = main(["--numbodies", "512", "--frames", "2", "--kernel", "xla",
               "--no-cycle", "--adaptive-dt", "0.01", "--devices", "8",
               "--mesh-rows", "2", "--steps-per-frame", "4"])
    assert rc == 0


def test_animate_avi(tmp_path, capsys):
    out = tmp_path / "demo.avi"
    rc = main(["--numbodies", "256", "--frames", "2", "--kernel", "xla",
               "--no-cycle", "--animate", str(out), "--width", "64",
               "--height", "48"])
    assert rc == 0
    data = out.read_bytes()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "


def test_adaptive_dt_window_validation(capsys):
    bad = (["--dt-min", "-1"], ["--dt-max", "0"],
           ["--dt-min", "0.1", "--dt-max", "0.01"],
           ["--dt-min", "0.1"])  # floor above the preset's time_step
    for extra in bad:
        rc = main(["--numbodies", "256", "--kernel", "xla",
                   "--adaptive-dt", "--frames", "1", *extra])
        assert rc == 1, extra
        assert "error:" in capsys.readouterr().err
    # --dt-min/--dt-max without --adaptive-dt is an error, not a no-op
    rc = main(["--numbodies", "256", "--kernel", "xla", "--frames", "1",
               "--dt-min", "0.001"])
    assert rc == 1
    assert "--adaptive-dt" in capsys.readouterr().err


def test_config_plummer_equilibrium_scales(capsys):
    """--config plummer runs end to end, overrides the N-bucket scale tuning
    with the equilibrium (1.0, 1.0), and --set still wins."""
    rc = main(["--numbodies", "256", "--frames", "2", "--kernel", "xla",
               "--no-cycle", "--config", "plummer", "--print-params"])
    assert rc == 0
    out = capsys.readouterr().out
    # print_values emits { dt, cluster_scale, velocity_scale, ... }
    assert ", 1.0, 1.0," in out

    rc = main(["--numbodies", "256", "--frames", "1", "--kernel", "xla",
               "--no-cycle", "--config", "plummer",
               "--set", "velocity_scale=0.5"])
    assert rc == 0
    assert "velocity_scale" in capsys.readouterr().out


def test_autosave_periodic_and_step_continuity(tmp_path, capsys):
    from nbody_tpu.io import load_checkpoint

    ck = tmp_path / "auto.npz"
    rc = main(["--numbodies", "128", "--frames", "3", "--kernel", "xla",
               "--no-cycle", "--steps-per-frame", "4",
               "--checkpoint-save", str(ck), "--autosave", "1"])
    assert rc == 0
    _, _, _, meta = load_checkpoint(ck)
    assert meta["step"] == 12  # 3 frames x 4 steps
    assert meta["config"] == "shell"
    assert not list(tmp_path.glob("*.tmp*"))  # atomic replace, no leftovers

    # resume: the step counter continues from the loaded checkpoint
    ck2 = tmp_path / "auto2.npz"
    rc = main(["--frames", "2", "--kernel", "xla", "--no-cycle",
               "--checkpoint-load", str(ck), "--checkpoint-save", str(ck2)])
    assert rc == 0
    _, _, _, meta2 = load_checkpoint(ck2)
    assert meta2["step"] == 14


def test_autosave_requires_checkpoint_save(capsys):
    assert main(["--numbodies", "128", "--frames", "1", "--kernel", "xla",
                 "--no-cycle", "--autosave", "1"]) == 1
    assert "error: --autosave needs --checkpoint-save" in capsys.readouterr().err
    assert main(["--numbodies", "128", "--frames", "1", "--kernel", "xla",
                 "--no-cycle", "--autosave", "0", "--checkpoint-save",
                 "x.npz"]) == 1
    assert "positive frame interval" in capsys.readouterr().err


def test_block_dt_demo(capsys):
    """--block-dt: per-body block timesteps drive the demo loop; the
    frame report carries the eval-row accounting (r5 item 3)."""
    rc = main(["--numbodies", "300", "--frames", "3", "--kernel", "xla",
               "--no-cycle", "--block-dt", "0.05", "--block-classes", "3",
               "--steps-per-frame", "2", "--energy"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "KDK leapfrog" in out          # euler->KDK note
    assert "of global" in out             # rows accounting in the report


def test_block_dt_rejects_incompatible_modes(capsys):
    for extra in (["--adaptive-dt"], ["--benchmark"], ["--qatest"],
                  ["--selftest"], ["--devices", "2"], ["--kernel", "pm"],
                  ["--integrator", "hermite"], ["--precision", "ds"],
                  ["--block-classes", "0"], ["--block-classes", "17"]):
        rc = main(["--numbodies", "256", "--block-dt", *extra])
        assert rc == 1, extra
        assert "error:" in capsys.readouterr().err
