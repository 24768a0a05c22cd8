"""March + composite tests against scalar NumPy oracles that re-state the
reference CUDA semantics (raymarching.cu / volumerendering.cu / losses.cu)."""
import numpy as np
import jax
import jax.numpy as jnp

from ingp_tpu.core import ray_aabb_intersect
from ingp_tpu.ops import packbits_u32
from ingp_tpu.ops.march import (MarchConfig, march_rays,
                                march_rays_lattice, sample_positions)
from ingp_tpu.ops.composite import (
    composite_rays, distortion_loss, ref_loss, render_weights,
)

SQRT3 = 1.7320508075688772


# ---------------------------------------------------------------------------
# scalar oracle marcher (same algorithm, plain python loops)
# ---------------------------------------------------------------------------

def _oracle_march(occ_dense, ro, rd, t1, t2, cfg: MarchConfig, noise):
    """occ_dense: (C, gs, gs, gs) bool indexed [mip, z, y, x]."""
    gs, C, scale = cfg.grid_size, cfg.cascades, cfg.scale
    f, S = cfg.exp_step_factor, cfg.capacity

    def calc_dt(t):
        return np.clip(t * f, SQRT3 / cfg.max_samples, SQRT3 * 2 * scale / gs)

    out = []
    if t1 < 0:
        return out
    t = t1 + calc_dt(t1) * noise
    iters = 0
    while 0 <= t < t2 and len(out) < S and iters < cfg.iters:
        iters += 1
        x = ro + t * rd
        dt = calc_dt(t)
        mx = np.max(np.abs(x))
        m1 = np.clip(np.frexp(mx)[1] + 1, 0, C - 1)
        m2 = np.clip(np.frexp(dt * gs)[1], 0, C - 1)
        mip = max(m1, m2)
        bound = min(2.0 ** (mip - 1), scale)
        n = np.clip(0.5 * (x / bound + 1) * gs, 0, gs - 1).astype(int)
        if occ_dense[mip, n[2], n[1], n[0]]:
            out.append((t, dt))
            t = t + dt
        else:
            sgn = np.where(rd >= 0, 0.5, -0.5)
            face = ((n + 0.5 + sgn) / gs * 2 - 1) * bound
            t_exit = t + max(np.min((face - x) / rd), 0.0)
            steps = max(np.ceil((t_exit - t) / dt), 1.0)
            t = t + steps * dt
    return out


def _make_grid(cfg, occupied_fn):
    """Row-major (C*gs^3,) occupancy from a predicate on world coords."""
    gs, C, scale = cfg.grid_size, cfg.cascades, cfg.scale
    dense = np.zeros((C, gs, gs, gs), bool)
    ax = (np.arange(gs) + 0.5) / gs * 2 - 1  # cell centers in [-1,1]
    for c in range(C):
        bound = min(2.0 ** (c - 1), scale)
        X, Y, Z = np.meshgrid(ax * bound, ax * bound, ax * bound,
                              indexing="ij")
        dense[c] = np.transpose(occupied_fn(X, Y, Z), (2, 1, 0))
    flat = dense.reshape(C, -1).reshape(-1)  # [mip, z, y, x] row-major
    bf = packbits_u32(jnp.asarray(flat.astype(np.float32)), 0.5)
    return dense, bf


def test_march_matches_scalar_oracle():
    cfg = MarchConfig(grid_size=32, cascades=1, scale=0.5,
                      exp_step_factor=0.0, max_samples=256,
                      capacity=64, iters=256)
    # occupied: a central ball of radius 0.25
    dense, bf = _make_grid(
        cfg, lambda x, y, z: x ** 2 + y ** 2 + z ** 2 < 0.25 ** 2)

    rng = np.random.default_rng(0)
    R = 32
    ro = np.stack([rng.uniform(-0.2, 0.2, R),
                   rng.uniform(-0.2, 0.2, R),
                   np.full(R, -2.0)], -1).astype(np.float32)
    rd = np.stack([rng.uniform(-0.15, 0.15, R),
                   rng.uniform(-0.15, 0.15, R),
                   np.ones(R)], -1).astype(np.float32)
    noise = rng.random(R).astype(np.float32)

    hits = ray_aabb_intersect(jnp.asarray(ro), jnp.asarray(rd),
                              jnp.zeros(3), jnp.full(3, cfg.scale))
    res = march_rays(cfg, bf, jnp.asarray(ro), jnp.asarray(rd), hits,
                     jnp.asarray(noise))
    ts = np.asarray(res["ts"]); dts = np.asarray(res["deltas"])
    ns = np.asarray(res["n_samples"])

    hits_np = np.asarray(hits)
    any_hit = False
    for r in range(R):
        want = _oracle_march(dense, ro[r], rd[r], hits_np[r, 0],
                             hits_np[r, 1], cfg, noise[r])
        assert ns[r] == len(want), f"ray {r}: {ns[r]} vs {len(want)}"
        any_hit |= len(want) > 0
        for s, (t_w, dt_w) in enumerate(want):
            np.testing.assert_allclose(ts[r, s], t_w, rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(dts[r, s], dt_w, rtol=1e-4)
    assert any_hit  # the test scene must actually produce samples


def test_lattice_march_equals_scan_march_synthetic():
    # exp_step_factor=0: the lattice formulation must match the scan
    # marcher exactly (same dt lattice, same occupancy tests)
    cfg = MarchConfig(grid_size=32, cascades=1, scale=0.5,
                      exp_step_factor=0.0, max_samples=256,
                      capacity=64, iters=512)
    dense, bf = _make_grid(
        cfg, lambda x, y, z: x ** 2 + y ** 2 + z ** 2 < 0.25 ** 2)
    rng = np.random.default_rng(1)
    R = 64
    ro = np.stack([rng.uniform(-0.3, 0.3, R), rng.uniform(-0.3, 0.3, R),
                   np.full(R, -2.0)], -1).astype(np.float32)
    rd = np.stack([rng.uniform(-0.2, 0.2, R), rng.uniform(-0.2, 0.2, R),
                   np.ones(R)], -1).astype(np.float32)
    noise = rng.random(R).astype(np.float32)
    hits = ray_aabb_intersect(jnp.asarray(ro), jnp.asarray(rd),
                              jnp.zeros(3), jnp.full(3, cfg.scale))
    a = march_rays(cfg, bf, jnp.asarray(ro), jnp.asarray(rd), hits,
                   jnp.asarray(noise))
    b = march_rays_lattice(cfg, bf, jnp.asarray(ro), jnp.asarray(rd),
                           hits, jnp.asarray(noise))
    np.testing.assert_array_equal(np.asarray(a["n_samples"]),
                                  np.asarray(b["n_samples"]))
    np.testing.assert_allclose(np.asarray(a["ts"]), np.asarray(b["ts"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a["deltas"]),
                               np.asarray(b["deltas"]), rtol=1e-5)


def _oracle_march_exact(occ_dense, ro, rd, t1, t2, cfg, noise):
    """Like _oracle_march but with the reference's exact skip: the
    do/while re-evaluates calc_dt at every sub-step
    (raymarching.cu:230-233) — i.e. all visited t lie on the dt lattice."""
    gs, C, scale = cfg.grid_size, cfg.cascades, cfg.scale
    f, S = cfg.exp_step_factor, cfg.capacity

    def calc_dt(t):
        return np.clip(t * f, SQRT3 / cfg.max_samples,
                       SQRT3 * 2 * scale / gs)

    out = []
    if t1 < 0:
        return out
    t = t1 + calc_dt(t1) * noise
    it = 0
    while 0 <= t < t2 and len(out) < S and it < cfg.iters:
        it += 1
        x = ro + t * rd
        dt = calc_dt(t)
        mx = np.max(np.abs(x))
        m1 = np.clip(np.frexp(mx)[1] + 1, 0, C - 1)
        m2 = np.clip(np.frexp(dt * gs)[1], 0, C - 1)
        mip = max(m1, m2)
        bound = min(2.0 ** (mip - 1), scale)
        n = np.clip(0.5 * (x / bound + 1) * gs, 0, gs - 1).astype(int)
        if occ_dense[mip, n[2], n[1], n[0]]:
            out.append((t, dt))
        t = t + dt  # exact lattice advance, occupied or not
    return out


def test_lattice_march_matches_exact_oracle_exponential():
    # exp_step_factor>0: the closed-form lattice must reproduce the
    # reference's exact skip semantics (dt re-evaluated each sub-step)
    cfg = MarchConfig(grid_size=32, cascades=2, scale=1.0,
                      exp_step_factor=1 / 64, max_samples=512,
                      capacity=96, iters=1024)
    dense, bf = _make_grid(
        cfg, lambda x, y, z: (np.abs(x) < 0.6) & (np.abs(y) < 0.6)
        & (np.abs(z) < 0.6))
    rng = np.random.default_rng(2)
    R = 32
    ro = np.stack([rng.uniform(-0.2, 0.2, R), rng.uniform(-0.2, 0.2, R),
                   np.full(R, -3.0)], -1).astype(np.float32)
    rd = np.stack([rng.uniform(-0.1, 0.1, R), rng.uniform(-0.1, 0.1, R),
                   np.ones(R)], -1).astype(np.float32)
    noise = rng.random(R).astype(np.float32)
    hits = ray_aabb_intersect(jnp.asarray(ro), jnp.asarray(rd),
                              jnp.zeros(3), jnp.full(3, cfg.scale))
    b = march_rays_lattice(cfg, bf, jnp.asarray(ro), jnp.asarray(rd),
                           hits, jnp.asarray(noise))
    hits_np = np.asarray(hits)
    nb = np.asarray(b["ts"])
    for r in range(R):
        want = _oracle_march_exact(dense, ro[r], rd[r], hits_np[r, 0],
                                   hits_np[r, 1], cfg, noise[r])
        n = int(np.asarray(b["n_samples"])[r])
        # closed-form boundary rounding may differ by one lattice point
        assert abs(n - len(want)) <= 1, f"ray {r}: {n} vs {len(want)}"
        for s in range(min(n, len(want))):
            np.testing.assert_allclose(nb[r, s], want[s][0], rtol=2e-4,
                                       atol=1e-5)


def test_march_samples_inside_occupied_cells():
    cfg = MarchConfig(grid_size=32, cascades=2, scale=1.0,
                      exp_step_factor=1 / 64, max_samples=256,
                      capacity=64, iters=256)
    dense, bf = _make_grid(
        cfg, lambda x, y, z: (np.abs(x) < 0.4) & (np.abs(y) < 0.4)
        & (np.abs(z) < 0.4))
    ro = jnp.array([[0., 0., -3.]], jnp.float32)
    rd = jnp.array([[0., 0., 1.]], jnp.float32)
    hits = ray_aabb_intersect(ro, rd, jnp.zeros(3), jnp.full(3, cfg.scale))
    res = march_rays(cfg, bf, ro, rd, hits, jnp.zeros(1))
    n = int(res["n_samples"][0])
    assert n > 0
    xyz = np.asarray(sample_positions(ro, rd, res["ts"], res["valid"]))[0, :n]
    assert np.all(np.abs(xyz[:, 2]) < 0.45)  # inside the occupied slab
    ts = np.asarray(res["ts"])[0, :n]
    assert np.all(np.diff(ts) > 0)  # strictly advancing


# ---------------------------------------------------------------------------
# composite vs sequential oracle (volumerendering.cu:66-115)
# ---------------------------------------------------------------------------

def _oracle_composite(sig, rgb, dt, t, nv, T_thr):
    R, S = sig.shape
    o = dict(opacity=np.zeros(R), depth=np.zeros(R), rgb=np.zeros((R, 3)),
             ws=np.zeros((R, S)), vr=np.zeros(R, int))
    for r in range(R):
        T = 1.0
        for s in range(nv[r]):
            a = 1 - np.exp(-sig[r, s] * dt[r, s])
            w = a * T
            o["rgb"][r] += w * rgb[r, s]
            o["depth"][r] += w * t[r, s]
            o["opacity"][r] += w
            o["ws"][r, s] = w
            o["vr"][r] += 1
            T *= 1 - a
            if T <= T_thr:
                break
    return o


def _random_samples(seed=0, R=16, S=24):
    rng = np.random.default_rng(seed)
    nv = rng.integers(0, S + 1, R)
    valid = np.arange(S)[None] < nv[:, None]
    sig = rng.exponential(30.0, (R, S)).astype(np.float32) * valid
    rgb = rng.random((R, S, 3)).astype(np.float32)
    dt = np.full((R, S), 0.01, np.float32)
    t = np.cumsum(dt, 1).astype(np.float32)
    return sig, rgb, dt, t, nv, valid


def test_composite_matches_oracle():
    sig, rgb, dt, t, nv, valid = _random_samples()
    T_thr = 1e-4
    # per-sample channel arrays are channel-major (C, R, S)
    res = composite_rays(jnp.asarray(sig),
                         jnp.moveaxis(jnp.asarray(rgb), -1, 0),
                         jnp.asarray(dt),
                         jnp.asarray(t), jnp.asarray(valid), T_thr)
    want = _oracle_composite(sig, rgb, dt, t, nv, T_thr)
    np.testing.assert_allclose(np.asarray(res["opacity"]), want["opacity"],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res["depth"]), want["depth"],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res["rgb"]), want["rgb"],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res["ws"]), want["ws"],
                               rtol=1e-3, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(res["vr_samples"]), want["vr"])


def test_composite_grads_match_analytic_dl_dsigma():
    # AD through the cumsum must reproduce the closed-form of
    # volumerendering.cu:234-241 (rgb-loss term only, no early stop)
    rng = np.random.default_rng(3)
    R, S = 4, 8
    sig = jnp.asarray(rng.random((R, S)).astype(np.float32) * 5)
    rgb = jnp.asarray(rng.random((R, S, 3)).astype(np.float32))
    dt = jnp.full((R, S), 0.05)
    t = jnp.cumsum(dt, 1)
    valid = jnp.ones((R, S), bool)
    dL_drgb = jnp.asarray(rng.random((R, 3)).astype(np.float32))

    def loss(s):
        res = composite_rays(s, jnp.moveaxis(rgb, -1, 0), dt, t, valid,
                             0.0)
        return jnp.sum(res["rgb"] * dL_drgb)

    g = np.asarray(jax.grad(loss)(sig))

    # closed form of volumerendering.cu:234-241: the kernel updates
    # T *= (1-a) BEFORE the gradient line, so the formula uses the
    # transmittance AFTER sample s and the inclusive rgb prefix sum:
    # dL/dsigma_s = delta_s * sum_c dL_c*(rgb_sc*T_{s+1} - (C_c - csum_sc))
    sig_n, rgb_n, dt_n = map(np.asarray, (sig, rgb, dt))
    a = 1 - np.exp(-sig_n * dt_n)
    T_before = np.cumprod(1 - a, 1) / (1 - a)
    T_after = np.cumprod(1 - a, 1)
    w = a * T_before
    C = (w[..., None] * rgb_n).sum(1)  # total rgb per ray
    csum = np.cumsum(w[..., None] * rgb_n, 1)
    want = dt_n * np.einsum("rc,rsc->rs", np.asarray(dL_drgb),
                            rgb_n * T_after[..., None]
                            - (C[:, None] - csum))
    np.testing.assert_allclose(g, want, rtol=1e-3, atol=1e-5)


def test_distortion_loss_vs_bruteforce():
    sig, _, dt, t, nv, valid = _random_samples(seed=5)
    ws, _ = render_weights(jnp.asarray(sig), jnp.asarray(dt),
                           jnp.asarray(valid), 1e-4)
    got = np.asarray(distortion_loss(ws, jnp.asarray(dt), jnp.asarray(t),
                                     jnp.asarray(valid)))
    w = np.asarray(ws)
    want = np.zeros(len(w))
    for r in range(len(w)):
        for i in range(w.shape[1]):
            for j in range(w.shape[1]):
                want[r] += w[r, i] * w[r, j] * abs(t[r, i] - t[r, j])
            want[r] += w[r, i] ** 2 * dt[r, i] / 3
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-6)


def test_ref_loss_composites_with_weights():
    sig, _, dt, t, nv, valid = _random_samples(seed=7)
    rng = np.random.default_rng(8)
    diff = rng.random(sig.shape + (3,)).astype(np.float32)
    ori = rng.random(sig.shape).astype(np.float32)
    Ro, Rp = ref_loss(jnp.asarray(sig),
                      jnp.moveaxis(jnp.asarray(diff), -1, 0),
                      jnp.asarray(ori),
                      jnp.asarray(dt), jnp.asarray(valid), 1e-4)
    ws, _ = render_weights(jnp.asarray(sig), jnp.asarray(dt),
                           jnp.asarray(valid), 1e-4)
    np.testing.assert_allclose(np.asarray(Ro),
                               (np.asarray(ws) * ori).sum(-1), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(Rp),
                               (np.asarray(ws)[..., None] * diff).sum(1),
                               rtol=1e-4)
