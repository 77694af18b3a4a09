"""Double-single (two-float32) precision kernel tests.

Production accuracy target is the Mosaic/TPU path. On CPU (interpret mode
+ jit), XLA's LLVM backend FMA-contracts one multiply-add inside the
fused error-free transformations (measured: exact at
--xla_backend_optimization_level=0, one-f32-ulp 'lo' damage at the
default level), so the CPU bounds below are ~2e-11 relative instead of
the ds-native ~1e-14 — still 5,000x tighter than f32, and tight enough
to catch any logic regression. See ops/ds_kernel.py for the full story.
"""

import numpy as np
import pytest

from nbody_tpu import NBodyConfig, ic
from nbody_tpu.ops.ds_kernel import (
    ds_from_f64,
    ds_to_f64,
    nbody_step_ds,
    rollout_ds,
)
from nbody_tpu.oracle.numpy_oracle import step_numpy

DT, SOFT, DAMP = 0.001, 0.1, 1.0


@pytest.fixture(scope="module")
def state64():
    pos, vel = ic.generate(NBodyConfig.SHELL, 512, 1.68, 2.98, seed=7)
    return pos.astype(np.float64), vel.astype(np.float64)


def test_ds_split_roundtrip_exact(state64):
    p64, _ = state64
    hi, lo = ds_from_f64(p64)
    assert np.abs(ds_to_f64(hi, lo) - p64).max() == 0.0


def test_ds_step_fp64_grade_vs_oracle(state64):
    """One ds step vs the float64 oracle: position agreement must be
    ~5 decimal orders beyond the f32 kernel's (which lands at ~5e-7)."""
    p64, v64 = state64
    np_, nv_ = nbody_step_ds(p64, v64, DT, SOFT, DAMP, tile_j=512,
                             interpret=True)
    op, ov = step_numpy(p64, v64, DT, SOFT, DAMP)
    assert np.abs(np_[:, :3] - op[:, :3]).max() < 1e-11
    # velocity error = force error * dt; bound the relative force error.
    # The CPU-jit bound is contraction-limited (~2e-8; see module
    # docstring) — still ~10x beyond the f32 kernel here and ~1e6x on
    # position; the TPU path measures ds-native accuracy (PARITY.md)
    a_scale = np.abs(ov[:, :3] - v64[:, :3]).max() / DT
    rel_force = np.abs(nv_[:, :3] - ov[:, :3]).max() / DT / a_scale
    assert rel_force < 5e-8


@pytest.mark.slow
def test_ds_rollout_matches_repeated_oracle_steps(state64):
    p64, v64 = state64
    gp, gv = rollout_ds(p64, v64, DT, SOFT, DAMP, steps=5, tile_j=512,
                        interpret=True)
    op, ov = p64, v64
    for _ in range(5):
        op, ov = step_numpy(op, ov, DT, SOFT, DAMP)
    assert np.abs(gp[:, :3] - op[:, :3]).max() < 1e-10
    assert np.isfinite(gv).all()


def test_ds_energy_drift_matches_f64_oracle(state64):
    """BASELINE config[2]'s criterion applied to the ds mode: the ds
    path's energy drift must match the f64 oracle's drift (same
    integrator, so the comparison is device-vs-oracle)."""
    from nbody_tpu.ops.energy import total_energy_f64

    p64, v64 = state64
    e0 = total_energy_f64(p64, v64, SOFT)
    steps = 10
    gp, gv = rollout_ds(p64, v64, 0.016, SOFT, DAMP, steps=steps,
                        tile_j=512, interpret=True)
    op, ov = p64, v64
    for _ in range(steps):
        op, ov = step_numpy(op, ov, 0.016, SOFT, DAMP)
    d_ds = (total_energy_f64(gp, gv, SOFT) - e0) / abs(e0)
    d_or = (total_energy_f64(op, ov, SOFT) - e0) / abs(e0)
    assert abs(d_ds - d_or) < 1e-9, (d_ds, d_or)


@pytest.mark.slow
def test_ds_body_system_api(state64):
    """DSBodySystem: set/get round-trip exact, stepping matches the
    ops-level rollout, energy defaults to the f64 functional."""
    from nbody_tpu.models import DSBodySystem
    from nbody_tpu.params import NBodyParams

    p64, v64 = state64
    s = DSBodySystem(512, NBodyParams(time_step=DT, softening=SOFT,
                                      damping=DAMP),
                     tile_j=512, state=(p64, v64))
    assert np.abs(s.positions - p64).max() == 0.0
    s.update_many(3)
    ref_p, ref_v = rollout_ds(p64, v64, DT, SOFT, DAMP, steps=3, tile_j=512,
                              interpret=True)
    assert np.abs(s.positions - ref_p).max() < 1e-13
    assert np.isfinite(s.total_energy())


@pytest.mark.slow
def test_cli_precision_ds_qatest(capsys):
    from nbody_tpu.cli import main

    rc = main(["--precision", "ds", "--qatest", "--numbodies", "512"])
    out = capsys.readouterr().out
    assert "double-single kernel" in out
    assert rc == 0, out


@pytest.mark.parametrize("strategy", [
    "allgather", pytest.param("ring", marks=pytest.mark.slow)])
def test_cli_precision_ds_qatest_mesh(capsys, strategy):
    """The ds MEASUREMENT modes shard too (r4): --qatest --devices 8
    runs the sharded ds step and passes the ds-grade gate."""
    import jax

    from nbody_tpu.cli import main

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    rc = main(["--precision", "ds", "--qatest", "--numbodies", "512",
               "--devices", "8", "--strategy", strategy])
    out = capsys.readouterr().out
    assert "8-device mesh" in out and strategy in out
    assert rc == 0, out


def test_cli_precision_ds_mesh_strategy_gate(capsys):
    """fp32-only mesh strategies stay rejected in the measurement modes."""
    from nbody_tpu.cli import main

    rc = main(["--precision", "ds", "--qatest", "--numbodies", "512",
               "--devices", "8", "--strategy", "sym"])
    assert rc == 1


def test_cli_precision_ds_scope_errors(capsys):
    """ds is a full product surface since r4 — the demo path RUNS; only
    genuinely contradictory combinations error (see test_cli.py's
    test_precision_ds_demo_gates for the full ladder)."""
    from nbody_tpu.cli import main

    rc = main(["--precision", "ds", "--numbodies", "128", "--frames", "1",
               "--no-cycle"])
    assert rc == 0
    assert "ds (fp64-grade)" in capsys.readouterr().out
    rc = main(["--precision", "ds", "--fp64", "--benchmark"])
    assert rc == 1


def test_sharded_ds_matches_single_device(state64):
    """8-device allgather ds step == single-device ds step (virtual mesh)."""
    import jax

    from nbody_tpu.ops.ds_kernel import _scal_ds, nbody_step_pallas_ds
    from nbody_tpu.parallel import make_mesh, make_sharded_ds_step

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    p64, v64 = state64
    ph, plo = ds_from_f64(p64)
    vh, vlo = ds_from_f64(v64)
    scal = _scal_ds(DT, SOFT, DAMP)
    ref = nbody_step_pallas_ds(ph, plo, vh, vlo, scal, tile_j=512,
                               interpret=True)

    mesh = make_mesh(8)
    step = make_sharded_ds_step(mesh, tile_j=512, interpret=True)
    out = step(ph, plo, vh, vlo, scal)
    for got, want in zip(out, ref):
        assert np.abs(np.asarray(got) - np.asarray(want)).max() < 1e-12


@pytest.mark.slow
def test_sharded_ds_leapfrog_matches_single_device(state64):
    """8-device allgather ds DKD step == single-device fused DKD step.
    Bit-identical by construction: both half-drift from the same gathered
    start-of-step state (parallel/sharded.py::make_sharded_ds_step)."""
    import jax

    from nbody_tpu.ops.ds_kernel import (
        _scal_ds_leapfrog,
        nbody_step_pallas_ds_leapfrog,
    )
    from nbody_tpu.parallel import make_mesh, make_sharded_ds_step

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    p64, v64 = state64
    ph, plo = ds_from_f64(p64)
    vh, vlo = ds_from_f64(v64)
    scal = _scal_ds_leapfrog(DT, SOFT, DAMP)
    ref = nbody_step_pallas_ds_leapfrog(ph, plo, vh, vlo, scal, tile_j=512,
                                        interpret=True)

    mesh = make_mesh(8)
    step = make_sharded_ds_step(mesh, tile_j=512, interpret=True,
                                integrator="leapfrog")
    out = step(ph, plo, vh, vlo, scal)
    for got, want in zip(out, ref):
        # identical per-shard arithmetic, but the CPU interpret path is
        # subject to the LLVM FMA-contraction hazard (module docstring):
        # shard_map changes fusion boundaries, so contraction lands in
        # different spots of the DKD half-drift EFT chains (~1e-9 here);
        # on-chip Mosaic compiles the same kernel program for both
        assert np.abs(np.asarray(got) - np.asarray(want)).max() < 5e-9
    with pytest.raises(ValueError):
        make_sharded_ds_step(mesh, integrator="rk4")


@pytest.mark.slow
def test_sharded_ds_hermite_matches_single_device(state64):
    """8-device ds Hermite P(EC) == single-device ds Hermite. Two gather
    rounds (start state, locally-predicted state); per-shard predictor/
    corrector arithmetic is identical to the single-device step
    (parallel/sharded.py::make_sharded_ds_step integrator='hermite')."""
    import jax

    from nbody_tpu.ops.ds_kernel import (
        _scal_ds_hermite,
        nbody_step_pallas_ds_hermite,
    )
    from nbody_tpu.parallel import make_mesh, make_sharded_ds_step

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    p64, v64 = state64
    ph, plo = ds_from_f64(p64)
    vh, vlo = ds_from_f64(v64)
    scal = _scal_ds_hermite(DT, SOFT, DAMP)
    ref = nbody_step_pallas_ds_hermite(ph, plo, vh, vlo, scal, tile_j=512,
                                       interpret=True)

    mesh = make_mesh(8)
    step = make_sharded_ds_step(mesh, tile_j=512, interpret=True,
                                integrator="hermite")
    out = step(ph, plo, vh, vlo, scal)
    for got, want in zip(out, ref):
        # same per-shard ds arithmetic; the CPU interpret path carries
        # the LLVM FMA-contraction caveat (shard_map moves fusion
        # boundaries in the predictor/corrector EFT chains) — on-chip
        # Mosaic compiles one kernel program for both sides
        assert np.abs(np.asarray(got) - np.asarray(want)).max() < 5e-9


def test_ds_accel_only_plus_integrate_matches_fused_step(state64):
    """The ring strategy's building blocks — the accel-ONLY ds kernel +
    the XLA-level ds integrator — reproduce the fused step exactly for
    the same (full) j-set (ops/ds_kernel.py::compute_accel_pallas_ds,
    _ds_integrate)."""
    from nbody_tpu.ops.ds_kernel import (
        _ds_integrate,
        _scal_ds,
        compute_accel_pallas_ds,
        nbody_step_pallas_ds,
    )

    p64, v64 = state64
    ph, plo = ds_from_f64(p64)
    vh, vlo = ds_from_f64(v64)
    scal = _scal_ds(DT, SOFT, DAMP)
    ref = nbody_step_pallas_ds(ph, plo, vh, vlo, scal, tile_j=512,
                               interpret=True)
    acc = compute_accel_pallas_ds(ph, plo, ph, plo, scal, tile_j=512,
                                  interpret=True)
    got = _ds_integrate(ph, plo, vh, vlo, acc, scal)
    for g, w in zip(got, ref):
        # in-kernel vs XLA-level integration: same anchored ds op
        # sequence, CPU-jit FMA-contraction caveat (module docstring)
        assert np.abs(np.asarray(g) - np.asarray(w)).max() < 5e-9


@pytest.mark.parametrize("integrator", [
    "euler",
    # euler keeps the ring dataflow covered fast; the two-gather-round
    # hermite ring is a 36 s heavyweight (r5 re-tier)
    pytest.param("leapfrog", marks=pytest.mark.slow),
    pytest.param("hermite", marks=pytest.mark.slow)])
def test_sharded_ds_ring_matches_single_device(state64, integrator):
    """strategy='ring' (j-planes rotating via ppermute, per-hop partial
    forces accumulated in anchored XLA-level ds) == the single-device ds
    step, for all three integrators. Differences vs allgather are ds-level
    reduction order only (parallel/sharded.py::make_sharded_ds_step)."""
    import jax

    from nbody_tpu.ops.ds_kernel import (
        _scal_ds,
        _scal_ds_hermite,
        _scal_ds_leapfrog,
        nbody_step_pallas_ds,
        nbody_step_pallas_ds_hermite,
        nbody_step_pallas_ds_leapfrog,
    )
    from nbody_tpu.parallel import make_mesh, make_sharded_ds_step

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    p64, v64 = state64
    ph, plo = ds_from_f64(p64)
    vh, vlo = ds_from_f64(v64)
    scal, single = {
        "euler": (_scal_ds, nbody_step_pallas_ds),
        "leapfrog": (_scal_ds_leapfrog, nbody_step_pallas_ds_leapfrog),
        "hermite": (_scal_ds_hermite, nbody_step_pallas_ds_hermite),
    }[integrator]
    scal = scal(DT, SOFT, DAMP)
    ref = single(ph, plo, vh, vlo, scal, tile_j=512, interpret=True)

    mesh = make_mesh(8)
    step = make_sharded_ds_step(mesh, tile_j=512, interpret=True,
                                integrator=integrator, strategy="ring")
    out = step(ph, plo, vh, vlo, scal)
    for got, want in zip(out, ref):
        # per-hop ds partials vs one in-kernel sweep: reduction-order
        # differences at ds precision + the CPU-jit FMA-contraction
        # caveat — fp64-grade either way (f32 would be ~1e-5 here)
        assert np.abs(np.asarray(got) - np.asarray(want)).max() < 5e-9
    with pytest.raises(ValueError):
        make_sharded_ds_step(mesh, strategy="ring_fused")


@pytest.mark.parametrize("integrator", [
    "euler", "leapfrog",
    # two gather+reduce-scatter rounds per step: slow-tier like the
    # hermite ring (euler/leapfrog keep the 2-D ds dataflow covered)
    pytest.param("hermite", marks=pytest.mark.slow)])
def test_sharded_ds_2d_matches_single_device(state64, integrator):
    """The 2-D rows×cols ds decomposition (two-axis plane gathers + the
    anchored ds ring reduce-scatter over cols) == the single-device ds
    step. Differences are ds-level reduction order only — per-column
    partials combined around the cols ring vs one in-kernel j-sweep
    (parallel/sharded.py::make_sharded_ds_step_2d)."""
    import jax

    from nbody_tpu.ops.ds_kernel import (
        _scal_ds,
        _scal_ds_hermite,
        _scal_ds_leapfrog,
        nbody_step_pallas_ds,
        nbody_step_pallas_ds_hermite,
        nbody_step_pallas_ds_leapfrog,
    )
    from nbody_tpu.parallel import make_mesh_2d, make_sharded_ds_step_2d

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    p64, v64 = state64
    ph, plo = ds_from_f64(p64)
    vh, vlo = ds_from_f64(v64)
    scal, single = {
        "euler": (_scal_ds, nbody_step_pallas_ds),
        "leapfrog": (_scal_ds_leapfrog, nbody_step_pallas_ds_leapfrog),
        "hermite": (_scal_ds_hermite, nbody_step_pallas_ds_hermite),
    }[integrator]
    scal = scal(DT, SOFT, DAMP)
    ref = single(ph, plo, vh, vlo, scal, tile_j=512, interpret=True)

    mesh = make_mesh_2d(2, 4)
    step = make_sharded_ds_step_2d(mesh, tile_j=512, interpret=True,
                                   integrator=integrator)
    out = step(ph, plo, vh, vlo, scal)
    for got, want in zip(out, ref):
        # ring-order ds partial combination vs one in-kernel sweep +
        # the CPU-jit FMA-contraction caveat — fp64-grade either way
        # (f32 would be ~1e-5 here)
        assert np.abs(np.asarray(got) - np.asarray(want)).max() < 5e-9


def test_ds_system_2d_mesh(state64):
    """DSBodySystem on a 2-D mesh: strategy resolves to '2d', planes
    shard P(('rows','cols'), None), update_many matches the
    single-device ds rollout at ds tolerance; allgather/ring and
    adaptive rollouts are rejected with instructive errors."""
    import jax

    from nbody_tpu.models import DSBodySystem
    from nbody_tpu.params import NBodyParams
    from nbody_tpu.parallel import make_mesh_2d

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    p64, v64 = state64
    prm = NBodyParams(time_step=DT, cluster_scale=1.68,
                      velocity_scale=2.98, softening=SOFT, damping=DAMP)
    mesh = make_mesh_2d(4, 2)
    s = DSBodySystem(512, prm, mesh=mesh, tile_j=512,
                     state=(p64, v64))
    assert s.strategy == "2d"
    ref = DSBodySystem(512, prm, tile_j=512, variant="one_sided",
                       state=(p64, v64))
    s.update_many(3)
    ref.update_many(3)
    assert np.abs(s.positions - ref.positions).max() < 5e-9
    assert np.abs(s.velocities - ref.velocities).max() < 5e-9

    with pytest.raises(ValueError, match="1-D body-mesh strategies"):
        DSBodySystem(512, prm, mesh=mesh, strategy="ring")


def test_sharded_ds_2d_adaptive_matches_single_device(state64):
    """The 2-D ds ADAPTIVE rollout == the single-device ds adaptive
    rollout, with one documented relaxation: the f32 criterion accel is
    a psum of per-column partials, so the traced dt (and hence the
    trajectory) matches to f32 rounding rather than bitwise — the step
    itself stays full ds (make_sharded_ds_adaptive_rollout_2d)."""
    import jax
    import numpy as np

    from nbody_tpu.ops.ds_kernel import (
        ds_to_f64,
        make_ds_adaptive_rollout,
    )
    from nbody_tpu.parallel import (
        make_mesh_2d,
        make_sharded_ds_adaptive_rollout_2d,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    p64, v64 = state64
    kw = dict(integrator="leapfrog", softening=SOFT, damping=DAMP,
              eta=0.02, dt_min=1e-5, dt_max=DT, steps=3, tile_j=512,
              interpret=True)

    def planes():
        # both rollouts donate their inputs: fresh planes per call
        ph, plo = ds_from_f64(p64)
        vh, vlo = ds_from_f64(v64)
        return ph, plo, vh, vlo

    ref = make_ds_adaptive_rollout(**kw)(*planes())
    mesh = make_mesh_2d(2, 4)
    got = make_sharded_ds_adaptive_rollout_2d(mesh, **kw)(*planes())
    # dt agreement: f32-rounding-level (psum'd criterion partials)
    assert np.allclose(np.asarray(got[4]), np.asarray(ref[4]),
                       rtol=1e-5, atol=0.0)
    # trajectory agreement: dominated by the dt difference (dt scales
    # the update directly), far below fp32-grade state error either way
    p_ref = ds_to_f64(np.asarray(ref[0]), np.asarray(ref[1]))
    p_got = ds_to_f64(np.asarray(got[0]), np.asarray(got[1]))
    assert np.abs(p_got - p_ref).max() < 1e-6


@pytest.mark.slow
def test_cli_precision_ds_drift_check(capsys):
    from nbody_tpu.cli import main

    rc = main(["--precision", "ds", "--drift-check", "3",
               "--numbodies", "256"])
    out = capsys.readouterr().out
    assert "energy drift" in out
    assert rc == 0, out


@pytest.mark.slow
def test_cli_precision_ds_drift_check_beyond_horizon(capsys):
    """Crossing DS_PARITY_HORIZON engages the two-tier gate: strict ds
    parity inside the shadowing horizon, the fp32-style scale criterion
    beyond it (chaos amplifies 1e-14 differences past any fixed absolute
    gate — measured e-folding ~6.5 steps at demo-0 dt)."""
    from nbody_tpu.cli import main

    rc = main(["--precision", "ds", "--drift-check", "55",
               "--numbodies", "256"])
    out = capsys.readouterr().out
    assert "energy drift over 50 steps" in out
    assert "energy drift over 55 steps" in out
    assert "shadowing horizon" in out
    assert rc == 0, out


def test_ds_leapfrog_matches_f64_oracle(state64):
    """Fused DKD ds step vs the f64 oracle leapfrog. The CPU-jit bound is
    contraction-limited (~5e-9 absolute; module docstring) — the TPU path
    measures ds-native ~1e-14 (scripts/tpu_ds_validate.py)."""
    from nbody_tpu.ops.ds_kernel import (
        _scal_ds_leapfrog,
        nbody_step_pallas_ds_leapfrog,
    )
    from nbody_tpu.oracle.numpy_oracle import step_numpy_leapfrog

    p64, v64 = state64
    scal = _scal_ds_leapfrog(0.004, SOFT, DAMP)
    ph, plo = ds_from_f64(p64)
    vh, vlo = ds_from_f64(v64)
    nph, npl, nvh, nvl = nbody_step_pallas_ds_leapfrog(
        ph, plo, vh, vlo, scal, tile_j=512, interpret=True)
    op, ov = step_numpy_leapfrog(p64.copy(), v64.copy(), 0.004, SOFT, DAMP)
    assert np.abs(ds_to_f64(nph, npl)[:, :3] - op[:, :3]).max() < 5e-8
    assert np.abs(ds_to_f64(nvh, nvl)[:, :3] - ov[:, :3]).max() < 5e-8


@pytest.mark.slow
def test_ds_body_system_leapfrog_bounded_drift(state64):
    """Symplectic + fp64-grade: 50-step leapfrog drift stays bounded and
    far below the Euler ds run's secular drift at the same dt."""
    from nbody_tpu.models import DSBodySystem
    from nbody_tpu.params import NBodyParams

    p64, v64 = state64
    params = NBodyParams(time_step=0.004, softening=SOFT, damping=1.0)
    lf = DSBodySystem(512, params, tile_j=512, integrator="leapfrog",
                      state=(p64, v64))
    e0 = lf.total_energy()
    lf.update_many(50)
    d_lf = abs((lf.total_energy() - e0) / e0)
    assert np.isfinite(lf.positions).all()
    assert d_lf < 5e-3  # bounded oscillation at dt=0.004 on this state


def test_cli_precision_ds_leapfrog_qatest(capsys):
    from nbody_tpu.cli import main

    rc = main(["--precision", "ds", "--qatest", "--numbodies", "512",
               "--integrator", "leapfrog"])
    out = capsys.readouterr().out
    assert rc == 0, out


@pytest.mark.slow
def test_ds_hermite_matches_f64_oracle(state64):
    """Two-dispatch ds Hermite P(EC) step vs the f64 oracle hermite. CPU
    interpret carries the contraction floor; TPU measures ~1e-14
    (scripts/tpu_ds_validate.py)."""
    from nbody_tpu.oracle.numpy_oracle import step_numpy_hermite
    from nbody_tpu.ops.ds_kernel import (
        _scal_ds_hermite,
        nbody_step_pallas_ds_hermite,
    )

    p64, v64 = state64
    scal = _scal_ds_hermite(0.004, SOFT, DAMP)
    ph, plo = ds_from_f64(p64)
    vh, vlo = ds_from_f64(v64)
    nph, npl, nvh, nvl = nbody_step_pallas_ds_hermite(
        ph, plo, vh, vlo, scal, tile_j=512, interpret=True)
    op, ov = step_numpy_hermite(p64.copy(), v64.copy(), 0.004, SOFT, DAMP)
    assert np.abs(ds_to_f64(nph, npl)[:, :3] - op[:, :3]).max() < 1e-7
    assert np.abs(ds_to_f64(nvh, nvl)[:, :3] - ov[:, :3]).max() < 1e-7
    # mass column preserved in both planes
    assert np.array_equal(np.asarray(nph)[:, 3], np.asarray(ph)[:, 3])
    assert np.array_equal(np.asarray(npl)[:, 3], np.asarray(plo)[:, 3])


@pytest.mark.slow
def test_ds_hermite_fourth_order(state64):
    """O(dt^4) local accuracy: against the f64 oracle hermite reference,
    the ds hermite one-step error vs a dt-halved two-step run contracts
    ~16x (euler would contract ~2-4x)."""
    from nbody_tpu.oracle.numpy_oracle import step_numpy_hermite
    from nbody_tpu.models import DSBodySystem
    from nbody_tpu.params import NBodyParams

    p64, v64 = state64
    params = NBodyParams(time_step=0.01, softening=SOFT, damping=1.0)

    def drift_err(dt, steps):
        s = DSBodySystem(512, params, tile_j=512, integrator="hermite",
                         state=(p64, v64))
        s.update_many(steps, dt)
        # truth: the same horizon integrated at dt/8 (error ~4096x smaller)
        op, ov = p64.copy(), v64.copy()
        for _ in range(steps * 8):
            op, ov = step_numpy_hermite(op, ov, dt / 8, SOFT, DAMP)
        return np.abs(s.positions[:, :3] - op[:, :3]).max()

    e_full = drift_err(0.02, 1)
    e_half = drift_err(0.01, 2)
    # 4th order: halving dt cuts the end-point error ~16x; allow slack
    # for the chaotic prefactor and the CPU contraction floor
    assert e_half < e_full / 6, (e_full, e_half)


@pytest.mark.slow
def test_cli_precision_ds_hermite(capsys):
    from nbody_tpu.cli import main

    rc = main(["--precision", "ds", "--qatest", "--numbodies", "512",
               "--integrator", "hermite"])
    out = capsys.readouterr().out
    assert rc == 0, out
    rc = main(["--precision", "ds", "--drift-check", "3",
               "--numbodies", "256", "--integrator", "hermite"])
    out = capsys.readouterr().out
    assert "energy drift" in out
    assert rc == 0, out


# ---- Newton's-third-law ds kernel ----


def test_ds_sym_matches_one_sided_and_oracle():
    """The symmetric ds step is ds-grade vs the f64 oracle and agrees with
    the one-sided ds step to ds rounding (measured bit-identical at this
    shape)."""
    import jax.numpy as jnp  # noqa: F401

    from nbody_tpu.ops.ds_kernel import (
        _scal_ds,
        ds_from_f64,
        ds_to_f64,
        nbody_step_ds,
        nbody_step_pallas_ds_sym,
    )

    pos, vel = ic.generate(NBodyConfig.SHELL, 640, 1.52, 2.0, seed=1,
                           dtype=np.float64)
    dt, soft = 1e-3, 0.1
    p_ref, _ = step_numpy(pos, vel, dt, soft, 1.0)

    ph, plo = ds_from_f64(pos)
    vh, vlo = ds_from_f64(vel)
    nph, npl, nvh, nvl = nbody_step_pallas_ds_sym(
        ph, plo, vh, vlo, _scal_ds(dt, soft, 1.0),
        tile_i=64, tile_j=128, interpret=True)
    p_sym = ds_to_f64(nph, npl)
    assert np.abs(p_sym[:, :3] - p_ref[:, :3]).max() < 1e-11

    p_ds, _ = nbody_step_ds(pos, vel, dt, soft, 1.0, tile_i=8, tile_j=128,
                            interpret=True)
    assert np.abs(p_sym[:, :3] - p_ds[:, :3]).max() < 1e-12


def test_ds_sym_validation():
    import jax.numpy as jnp
    import pytest

    from nbody_tpu.ops.ds_kernel import (
        DS_SYM_MAX_N,
        _scal_ds,
        nbody_step_pallas_ds_sym,
    )

    big = jnp.zeros((DS_SYM_MAX_N + 128, 4), jnp.float32)
    with pytest.raises(ValueError, match="blocked"):
        nbody_step_pallas_ds_sym(big, big, big, big,
                                 _scal_ds(1e-3, 0.1, 1.0), interpret=True)


@pytest.mark.slow
def test_ds_system_sym_variant():
    """DSBodySystem variant plumbing: auto picks sym for euler at small N;
    rollouts match the one-sided system to ds rounding."""
    import pytest

    from nbody_tpu.models.ds_system import DSBodySystem
    from nbody_tpu.params import NBodyParams

    params = NBodyParams(softening=0.1, damping=1.0)
    a = DSBodySystem(256, params, seed=5, tile_j=128)  # auto -> sym
    assert a.variant == "sym"
    b = DSBodySystem(256, params, seed=5, tile_j=128, variant="one_sided")
    a.update_many(5, 1e-3)
    b.update_many(5, 1e-3)
    assert np.abs(a.positions - b.positions).max() < 1e-12

    lf = DSBodySystem(256, params, integrator="leapfrog")  # auto -> one_sided
    assert lf.variant == "one_sided"
    with pytest.raises(ValueError, match="euler"):
        DSBodySystem(256, params, integrator="leapfrog", variant="sym")


@pytest.mark.slow
def test_ds_aj_sym_matches_one_sided():
    """The symmetric ds accel+jerk agrees with the one-sided kernel to ds
    rounding — BOTH quantities (jerk reaction is antisymmetric too)."""
    import jax.numpy as jnp  # noqa: F401

    from nbody_tpu.ops.ds_kernel import (
        _scal_ds,
        compute_accel_jerk_pallas_ds,
        compute_accel_jerk_pallas_ds_sym,
        ds_from_f64,
        ds_to_f64,
    )

    pos, vel = ic.generate(NBodyConfig.SHELL, 512, 1.52, 2.0, seed=1,
                           dtype=np.float64)
    ph, plo = ds_from_f64(pos)
    vh, vlo = ds_from_f64(vel)
    scal = _scal_ds(1e-3, 0.1, 1.0)
    a1h, a1l, j1h, j1l = compute_accel_jerk_pallas_ds(
        ph, plo, vh, vlo, ph, plo, vh, vlo, scal,
        tile_i=8, tile_j=128, interpret=True)
    a2h, a2l, j2h, j2l = compute_accel_jerk_pallas_ds_sym(
        ph, plo, vh, vlo, scal, tile_i=64, tile_j=128, interpret=True)
    a1, a2 = ds_to_f64(a1h, a1l), ds_to_f64(a2h, a2l)
    jr1, jr2 = ds_to_f64(j1h, j1l), ds_to_f64(j2h, j2l)
    assert np.abs(a1 - a2).max() / np.abs(a1).max() < 1e-12
    assert np.abs(jr1 - jr2).max() / np.abs(jr1).max() < 1e-12


@pytest.mark.slow
def test_ds_hermite_sym_step_and_system():
    """hermite + variant='sym' through the step AND DSBodySystem matches
    the one-sided hermite to ds rounding; auto picks sym at small N."""
    from nbody_tpu.models.ds_system import DSBodySystem
    from nbody_tpu.params import NBodyParams

    params = NBodyParams(softening=0.1, damping=1.0)
    a = DSBodySystem(256, params, seed=5, integrator="hermite",
                     tile_j=128)  # auto -> sym
    assert a.variant == "sym"
    b = DSBodySystem(256, params, seed=5, integrator="hermite",
                     tile_j=128, variant="one_sided")
    a.update_many(4, 1e-3)
    b.update_many(4, 1e-3)
    assert np.abs(a.positions - b.positions).max() < 1e-12


@pytest.mark.slow
def test_rollout_none_tile_defaults_per_integrator():
    """rollout_pallas_ds with tile_j=None lets each step resolve its own
    tuned default — a direct caller must not inherit the euler tile into
    the hermite accel+jerk kernel (whose j-tile is vmem-capped)."""
    from nbody_tpu.ops.ds_kernel import (
        _scal_ds_hermite,
        ds_from_f64,
        ds_to_f64,
        nbody_step_pallas_ds_hermite,
        rollout_pallas_ds,
    )

    pos, vel = ic.generate(NBodyConfig.SHELL, 256, 1.52, 2.0, seed=2,
                           dtype=np.float64)
    ph, plo = ds_from_f64(pos)
    vh, vlo = ds_from_f64(vel)
    scal = _scal_ds_hermite(1e-3, 0.1, 1.0)
    out = rollout_pallas_ds(ph, plo, vh, vlo, scal, steps=2,
                            integrator="hermite", sym=True, interpret=True)
    ph2, plo2 = ds_from_f64(pos)
    vh2, vlo2 = ds_from_f64(vel)
    for _ in range(2):
        ph2, plo2, vh2, vlo2 = nbody_step_pallas_ds_hermite(
            ph2, plo2, vh2, vlo2, scal, sym=True, interpret=True)
    assert np.abs(ds_to_f64(out[0], out[1])
                  - ds_to_f64(ph2, plo2)).max() < 1e-13


@pytest.mark.slow
def test_ds_sym_blocked_matches_one_sided():
    """The blockwise ds composition (self triangles + ds cross rectangles)
    matches the one-sided ds step; blocking forced via block_cap."""
    from nbody_tpu.ops.ds_kernel import (
        _scal_ds,
        ds_from_f64,
        ds_to_f64,
        nbody_step_pallas_ds,
        nbody_step_pallas_ds_sym,
        nbody_step_pallas_ds_sym_blocked,
    )

    pos, vel = ic.generate(NBodyConfig.SHELL, 640, 1.52, 2.0, seed=9,
                           dtype=np.float64)
    ph, plo = ds_from_f64(pos)
    vh, vlo = ds_from_f64(vel)
    scal = _scal_ds(1e-3, 0.1, 1.0)
    o = nbody_step_pallas_ds(ph, plo, vh, vlo, scal, tile_j=128,
                             interpret=True)
    ref = ds_to_f64(o[0], o[1])
    for cap in (256, 384):
        b = nbody_step_pallas_ds_sym_blocked(
            ph, plo, vh, vlo, scal, tile_i=64, tile_j=128, interpret=True,
            block_cap=cap)
        assert np.abs(ds_to_f64(b[0], b[1]) - ref).max() < 1e-12, cap

    # delegation below the cap is bit-identical to the single triangle
    a = nbody_step_pallas_ds_sym(ph, plo, vh, vlo, scal, tile_i=64,
                                 tile_j=128, interpret=True)
    d = nbody_step_pallas_ds_sym_blocked(ph, plo, vh, vlo, scal, tile_i=64,
                                         tile_j=128, interpret=True,
                                         block_cap=1024)
    for x, y in zip(a, d):
        assert np.array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_ds_system_euler_sym_any_n(monkeypatch):
    """DSBodySystem euler auto-resolves to sym at ANY N now (the blocked
    composition); the cap monkeypatched small BEFORE construction so the
    update() and update_many() paths genuinely run blocked in interpret
    mode, compared against the one-sided system."""
    import nbody_tpu.ops.ds_kernel as dsk
    from nbody_tpu.models.ds_system import DSBodySystem
    from nbody_tpu.params import NBodyParams

    monkeypatch.setattr(dsk, "DS_SYM_MAX_N", 256)
    params = NBodyParams(softening=0.1, damping=1.0)
    a = DSBodySystem(640, params, integrator="euler", tile_j=128, seed=4)
    assert a.variant == "sym"  # no cap for euler anymore
    b = DSBodySystem(640, params, integrator="euler", tile_j=128, seed=4,
                     variant="one_sided")
    a.update(1e-3)
    b.update(1e-3)
    assert np.abs(a.positions - b.positions).max() < 1e-12
    a.update_many(3, 1e-3)
    b.update_many(3, 1e-3)
    assert np.abs(a.positions - b.positions).max() < 1e-12


@pytest.mark.slow
def test_ds_aj_sym_blocked_matches_triangle():
    """The blocked ds accel+jerk composition (self triangles + cross
    rectangles with 12 reaction scratches) matches the single triangle
    to ds rounding for BOTH quantities; k=2,3,4 cover one-cross,
    multi-cross, and remainder-pad shapes, and delegation under the cap
    is bit-exact."""
    from nbody_tpu.ops.ds_kernel import (
        _scal_ds_hermite,
        compute_accel_jerk_pallas_ds_sym,
        compute_accel_jerk_pallas_ds_sym_blocked,
        ds_from_f64,
        ds_to_f64,
    )

    pos, vel = ic.generate(NBodyConfig.RANDOM, 1000, 1.54, 8.0, seed=5,
                           dtype=np.float64)
    ph, plo = ds_from_f64(pos)
    vh, vlo = ds_from_f64(vel)
    fscal = _scal_ds_hermite(1e-3, 0.1, 1.0)[:, :4]
    ref = compute_accel_jerk_pallas_ds_sym(
        ph, plo, vh, vlo, fscal, tile_i=8, tile_j=128, interpret=True)
    for cap in (512, 384, 256):
        got = compute_accel_jerk_pallas_ds_sym_blocked(
            ph, plo, vh, vlo, fscal, tile_i=8, tile_j=128, interpret=True,
            block_cap=cap)
        for name, i in (("acc", 0), ("jerk", 2)):
            r = ds_to_f64(ref[i], ref[i + 1])
            g = ds_to_f64(got[i], got[i + 1])
            assert np.abs(g - r).max() / np.abs(r).max() < 1e-12, (cap, name)

    under = compute_accel_jerk_pallas_ds_sym_blocked(
        ph, plo, vh, vlo, fscal, tile_i=8, tile_j=128, interpret=True,
        block_cap=4096)
    for i in range(4):
        assert np.array_equal(np.asarray(under[i]), np.asarray(ref[i])), i


@pytest.mark.slow
def test_ds_system_hermite_sym_any_n(monkeypatch):
    """DSBodySystem hermite auto-resolves to sym at ANY N now (the
    blocked accel+jerk composition); caps monkeypatched small BEFORE
    construction so update() and update_many() genuinely run blocked in
    interpret mode, compared against the one-sided hermite system."""
    import nbody_tpu.ops.ds_kernel as dsk
    from nbody_tpu.models.ds_system import DSBodySystem
    from nbody_tpu.params import NBodyParams

    monkeypatch.setattr(dsk, "DS_AJ_SYM_MAX_N", 256)
    params = NBodyParams(softening=0.1, damping=1.0)
    a = DSBodySystem(640, params, integrator="hermite", tile_j=128, seed=4)
    assert a.variant == "sym"  # no cap for hermite anymore
    b = DSBodySystem(640, params, integrator="hermite", tile_j=128, seed=4,
                     variant="one_sided")
    a.update(1e-3)
    b.update(1e-3)
    assert np.abs(a.positions - b.positions).max() < 1e-12
    a.update_many(3, 1e-3)
    b.update_many(3, 1e-3)
    assert np.abs(a.positions - b.positions).max() < 1e-12


# ---- adaptive ds rollouts (ds_scal_with_dt + make_ds_adaptive_rollout) ----


@pytest.mark.slow
@pytest.mark.parametrize("integrator", ["euler", "leapfrog", "hermite"])
def test_ds_adaptive_fixed_window_matches_update_many(integrator):
    """dt_min == dt_max degenerates the adaptive ds rollout to the
    fixed-dt path — this pins ds_scal_with_dt's traced-dt scal rebuild
    (column mapping and coefficient arithmetic) against the host
    _scal_ds* builders for every integrator, end to end through
    DSBodySystem. dt is a power of two so the host f64 split and the
    traced f32 rebuild agree on the dt/dt-half columns exactly; the
    hermite dt-power columns differ only at the ds lo-plane ulp (the
    1/6 pair), hence the ~1e-13 bound instead of bit-equality there."""
    from nbody_tpu.models import DSBodySystem
    from nbody_tpu.params import NBodyParams

    dt = 2.0 ** -6
    params = NBodyParams(time_step=dt, softening=SOFT, damping=1.0)
    a = DSBodySystem(64, params, seed=11, integrator=integrator, tile_j=128)
    b = DSBodySystem(64, params, seed=11, integrator=integrator, tile_j=128)
    a.update_many(6, dt)
    stats = b.update_many_adaptive(6, dt_min=dt, dt_max=dt)
    assert stats["dt_lo"] == stats["dt_hi"] == pytest.approx(dt)
    assert stats["t"] == pytest.approx(6 * dt, rel=1e-6)
    tol = 0.0 if integrator in ("euler", "leapfrog") else 5e-13
    np.testing.assert_allclose(a.positions, b.positions, rtol=0, atol=tol)
    np.testing.assert_allclose(a.velocities, b.velocities, rtol=0, atol=tol)


@pytest.mark.slow
def test_ds_adaptive_criterion_matches_f32_formula():
    """The adaptive ds rollout picks dt from the f32 criterion evaluated
    on the HI planes: euler/leapfrog use eta*sqrt(eps/max|a|), hermite
    Aarseth's eta*min(|a|/|j|) — cross-checked against the criterion
    functions applied to the same planes outside the rollout."""
    from nbody_tpu.models import DSBodySystem
    from nbody_tpu.ops.adaptive import aarseth_timestep, accel_timestep
    from nbody_tpu.ops.pallas_kernel import (
        compute_accel_jerk_pallas,
        compute_accel_pallas,
    )
    from nbody_tpu.params import NBodyParams

    params = NBodyParams(time_step=1.0, softening=SOFT, damping=1.0)

    s = DSBodySystem(64, params, seed=3, tile_j=128)
    acc = compute_accel_pallas(s._ph, s._ph, SOFT, interpret=True)
    expect = float(accel_timestep(acc, SOFT, 0.025, 1e-9, 1.0))
    stats = s.update_many_adaptive(1, eta=0.025, dt_min=1e-9, dt_max=1.0)
    assert stats["dt_last"] == pytest.approx(expect, rel=1e-6)
    assert 1e-9 < stats["dt_last"] < 1.0  # genuinely chosen, not clamped

    h = DSBodySystem(64, params, seed=3, integrator="hermite", tile_j=128)
    acc, jerk = compute_accel_jerk_pallas(h._ph, h._vh, h._ph, h._vh, SOFT,
                                          interpret=True)
    expect = float(aarseth_timestep(acc, jerk, 0.025, 1e-9, 1.0))
    stats = h.update_many_adaptive(1, eta=0.025, dt_min=1e-9, dt_max=1.0)
    assert stats["dt_last"] == pytest.approx(expect, rel=1e-6)
    assert 1e-9 < stats["dt_last"] < 1.0


def test_ds_explicit_tile_i_beats_tune_cache(monkeypatch):
    """An EXPLICIT tile_i equal to the compile-time default must survive
    an autotuner winner with a different tile (review finding r4: the
    old `tile_i == DS_TILE_I` guard conflated 'unspecified' with
    'explicitly the default'); tile_i=None adopts the winner."""
    import nbody_tpu.models.ds_system as ds_mod
    import nbody_tpu.tune as tune
    from nbody_tpu.models import DSBodySystem
    from nbody_tpu.ops.ds_kernel import DS_TILE_I
    from nbody_tpu.params import NBodyParams

    monkeypatch.setattr(ds_mod, "_on_tpu", lambda: True)
    monkeypatch.setattr(
        tune, "best_config",
        lambda n, family="euler": {"variant": "sym", "tile_i": 32,
                                   "tile_j": 128})
    params = NBodyParams(softening=SOFT, damping=1.0)
    s = DSBodySystem(256, params, interpret=True)  # unspecified -> winner
    assert (s.tile_i, s.tile_j, s.variant) == (32, 128, "sym")
    s = DSBodySystem(256, params, tile_i=DS_TILE_I, interpret=True)
    assert s.tile_i == DS_TILE_I  # explicit default value honored
    s = DSBodySystem(256, params, tile_i=16, interpret=True)
    assert s.tile_i == 16


@pytest.mark.parametrize("integrator", [
    "euler",
    # euler is the fast-tier representative (r5 re-tier)
    pytest.param("leapfrog", marks=pytest.mark.slow),
    pytest.param("hermite", marks=pytest.mark.slow)])
def test_sharded_ds_adaptive_matches_single_device(integrator):
    """8-device sharded ds ADAPTIVE rollout == the single-device ds
    adaptive rollout: the criterion's local-i-rows-vs-gathered-j form
    keeps each row's reduction order identical, so the pmax'd dt — and
    with it the whole trajectory — matches, not just approximately
    (completes the adaptive x precision x mesh matrix)."""
    import jax

    from nbody_tpu.ops.ds_kernel import make_ds_adaptive_rollout
    from nbody_tpu.parallel import make_mesh, make_sharded_ds_adaptive_rollout

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    pos, vel = ic.generate(NBodyConfig.SHELL, 128, 1.68, 2.98, seed=9)
    ph, plo = ds_from_f64(pos.astype(np.float64))
    vh, vlo = ds_from_f64(vel.astype(np.float64))
    kw = dict(integrator=integrator, softening=SOFT, damping=DAMP,
              eta=0.025, dt_min=1e-6, dt_max=0.016, steps=3,
              tile_j=128, interpret=True)
    import jax.numpy as jnp

    # both rollouts donate their inputs: hand each its own copies
    ref = make_ds_adaptive_rollout(**kw)(
        *(jnp.array(x, copy=True) for x in (ph, plo, vh, vlo)))
    mesh = make_mesh(8)
    got = make_sharded_ds_adaptive_rollout(mesh, **kw)(
        *(jnp.array(x, copy=True) for x in (ph, plo, vh, vlo)))
    # euler's one-sided i-vs-j chains match to lo-plane exactness; the
    # DKD/P(EC) EFT chains carry the CPU-interpret LLVM FMA-contraction
    # wobble across different fusion boundaries (5e-9 is the fixed-dt
    # sharded tests' ONE-step bound; three steps compound it) — on-chip
    # Mosaic has no such hazard
    tol = 1e-12 if integrator == "euler" else 3 * 5e-9
    for g, w in zip(got[:4], ref[:4]):
        assert np.abs(np.asarray(g) - np.asarray(w)).max() < tol
    st_g, st_w = np.asarray(got[4]), np.asarray(ref[4])
    np.testing.assert_allclose(st_g, st_w, rtol=1e-6)
    assert 1e-6 < st_g[1] < 0.016  # dt genuinely chosen, not clamped


def test_ds_system_mesh_adaptive(monkeypatch):
    """DSBodySystem.update_many_adaptive on a body mesh: stats account
    like the single-device path and the trajectory matches it."""
    import jax

    from nbody_tpu.models import DSBodySystem
    from nbody_tpu.parallel import make_mesh
    from nbody_tpu.params import NBodyParams

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    params = NBodyParams(time_step=0.016, softening=SOFT, damping=1.0)
    a = DSBodySystem(128, params, seed=6, tile_j=128)
    b = DSBodySystem(128, params, seed=6, tile_j=128, mesh=make_mesh(8))
    sa = a.update_many_adaptive(3, eta=0.025)
    sb = b.update_many_adaptive(3, eta=0.025)
    assert sb["dt_last"] == pytest.approx(sa["dt_last"], rel=1e-6)
    assert sb["t"] == pytest.approx(sa["t"], rel=1e-6)
    np.testing.assert_allclose(a.positions, b.positions, atol=1e-12)
