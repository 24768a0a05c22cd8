"""Ocean-wave spectrum playground — TPU-native rebuild of the
reference's dynamic-water experiment (utility/test_dynamic.py:1-188).

The reference script builds an Elfouhaily-style unified wave spectrum
(long-wave JONSWAP-peaked branch + short capillary branch + a
directional spreading term), seeds it with complex Gaussian noise,
evolves per-wavevector phases with the deep-water dispersion relation
omega(k) = sqrt(g k (1 + (k/KM)^2)), and inverse-FFTs each timestep
into a displaced heightfield for a matplotlib GIF.

TPU-first design differences from the numpy/matplotlib original:
  * everything from the spectrum build to the per-frame displacement
    fields is pure jnp and jit-compiled — the wavevector lattice is
    traced once instead of being rebuilt per frame (the reference
    recomputes the meshgrid inside `animate`);
  * a whole animation is synthesized in ONE batched `ifft2` over the
    stacked time axis (frames, res, res) — FFTs batch perfectly on
    the MXU/VPU, so 120 frames cost one dispatch, not 120;
  * plotting/GIF export is an optional host-side tail, gated on
    matplotlib availability (the math works headless).

Reference-behavior notes (kept as-is for parity, quirks included):
  * the `sigma` factor in the JONSWAP peak enhancement multiplies the
    exponent (test_dynamic.py:46) rather than dividing it;
  * the mirrored spectrum `h0_star` is the flipped — not conjugated —
    copy of `h0` (test_dynamic.py:126), so eta stays complex and only
    its real part is used.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

G = 9.81        # gravity [m/s^2]
KM = 370.0      # capillary-gravity crossover wavenumber [rad/m]
CM = 0.23       # phase speed minimum [m/s]


def dispersion(k):
    """Deep-water + capillary dispersion omega(k) (test_dynamic.py:16)."""
    return jnp.sqrt(G * k * (1.0 + (k / KM) ** 2))


@functools.partial(jax.jit, static_argnames=("resolution",))
def wave_vectors(resolution: int = 512, size: float = 15.0):
    """Signed FFT-ordered wavevector lattice.

    Returns (K, k): K is (res, res, 2) wavevectors in rad/m with the
    first half of each axis positive and the second half wrapped
    negative (the reference's half-resolution mask trick,
    test_dynamic.py:29-36), k its magnitude.
    """
    coord = jnp.linspace(0.5, resolution + 0.5, resolution)
    n, m = jnp.meshgrid(coord, coord)
    n = jnp.where(n < resolution * 0.5, n, n - resolution)
    m = jnp.where(m < resolution * 0.5, m, m - resolution)
    K = jnp.stack([n, m], axis=2) * (2.0 * jnp.pi / size)
    return K, jnp.linalg.norm(K, axis=2)


@functools.partial(jax.jit, static_argnames=("resolution",))
def init_spectrum(u_wind, resolution: int = 512, size: float = 15.0):
    """Per-wavevector wave amplitude sqrt(S/2)*dk.

    The unified directional spectrum of test_dynamic.py:19-73: a
    long-wave curvature branch Bl (Pierson–Moskowitz cutoff x JONSWAP
    peak enhancement x inverse-wave-age decay), a short capillary
    branch Bh pinned at k≈KM, and a tanh directional spreading Delta
    modulating cos(2 phi) about the wind direction.
    """
    u_wind = jnp.asarray(u_wind, jnp.float32)
    inv_age = 0.84                      # inverse wave age Omega
    gamma = 1.7                         # JONSWAP peak enhancement
    sigma = 0.08 * (1.0 + 4.0 * inv_age ** -3.0)
    alpha_p = 0.006 * jnp.sqrt(inv_age)

    K, k = wave_vectors(resolution, size)
    wind_speed = jnp.linalg.norm(u_wind)
    kp = G * (inv_age / wind_speed) ** 2       # spectral peak
    c = dispersion(k) / k                      # phase speeds
    cp = dispersion(kp) / kp

    # long-wave branch
    cutoff = jnp.exp(-1.25 * (kp / k) ** 2)
    peak_arg = jnp.exp(-((jnp.sqrt(k / kp) - 1.0) ** 2) / 2.0
                       * sigma ** 2)           # sigma multiplies: see note
    jonswap = gamma ** peak_arg
    Fp = (cutoff * jonswap
          * jnp.exp(-inv_age / jnp.sqrt(10.0) * (jnp.sqrt(k / kp) - 1.0)))
    Bl = 0.5 * alpha_p * (cp / c) * Fp

    # short (capillary) branch, friction-velocity scaled
    z0 = 0.000037 * wind_speed ** 2 / G * (wind_speed / cp) ** 0.9
    u_star = 0.41 * wind_speed / jnp.log(10.0 / z0)
    alpha_m = 0.01 * jnp.where(u_star < CM,
                               1.0 + jnp.log(u_star / CM),
                               1.0 + 3.0 * jnp.log(u_star / CM))
    Fm = jnp.exp(-0.25 * (k / KM - 1.0) ** 2)
    Bh = 0.5 * alpha_m * (CM / c) * Fm * cutoff

    # directional spreading about the wind
    a0 = jnp.log(2.0) / 4.0
    am = 0.13 * u_star / CM
    spread = jnp.tanh(a0 + 4.0 * (c / cp) ** 2.5 + am * (CM / c) ** 2.5)
    cos_phi = (K / k[..., None]) @ (u_wind / wind_speed)

    S = ((1.0 / (2.0 * jnp.pi)) * k ** -4.0 * (Bl + Bh)
         * (1.0 + spread * (2.0 * cos_phi ** 2 - 1.0)))
    dk = 2.0 * jnp.pi / size
    return jnp.sqrt(S / 2.0) * dk


def seed_field(key, spectrum):
    """Complex-Gaussian-seeded initial field h0 and its mirrored
    partner (test_dynamic.py:124-127)."""
    kr, ki, kp = jax.random.split(key, 3)
    res = spectrum.shape[0]
    h0 = (jax.random.normal(kr, (res, res))
          + 1j * jax.random.normal(ki, (res, res))) * spectrum
    h0_star = jnp.flip(h0, axis=(0, 1))
    phase0 = jax.random.normal(kp, (res, res))
    return h0, h0_star, phase0


@functools.partial(jax.jit, static_argnames=("resolution",))
def evolve_phase(phase0, t, resolution: int = 512, size: float = 250.0):
    """Advance per-wavevector phases by omega(k)*t mod 2pi
    (test_dynamic.py:75-88)."""
    _, k = wave_vectors(resolution, size)
    return jnp.mod(phase0 + dispersion(k) * t, 2.0 * jnp.pi)


@functools.partial(jax.jit, static_argnames=("resolution",))
def synthesize(h0, h0_star, phase0, times, amplitude: float = 1e4,
               resolution: int = 512, size: float = 500.0):
    """Displacement fields for a batch of timestamps in one dispatch.

    Returns (T, res, res, 3): lateral chop (dX, dY) from the gradient
    phase shift i*K_hat and the vertical heightfield dZ
    (test_dynamic.py:141-163), all real f32. The whole animation is
    one batched ifft2 — frames along the leading axis.
    """
    K, k = wave_vectors(resolution, size)
    k_hat = K / jnp.where(k[..., None] == 0, 1.0, k[..., None])
    times = jnp.asarray(times, jnp.float32)

    phases = jax.vmap(
        lambda t: evolve_phase(phase0, t, resolution, size))(times)
    rot = jnp.exp(1j * phases)
    ht = h0[None] * rot + h0_star[None] * jnp.conj(rot)
    eta = jnp.fft.ifft2(ht, axes=(-2, -1))

    dz = jnp.real(eta) * amplitude
    dx = jnp.real(eta * 1j) * amplitude * k_hat[None, :, :, 0]
    dy = jnp.real(eta * 1j) * amplitude * k_hat[None, :, :, 1]
    return jnp.stack([dx, dy, dz], axis=-1).astype(jnp.float32)


def animate_gif(path: str, u_wind=(-5.0, 5.0), resolution: int = 512,
                size: float = 500.0, frames: int = 120,
                freq: float = 15.0, amplitude: float = 1e4,
                fps: int = 10, seed: int = 0) -> bool:
    """Render the reference's 3D surface GIF (test_dynamic.py:134-188).

    All frames are synthesized on device first; matplotlib only
    replays host arrays. Returns False (no-op) when matplotlib is
    unavailable so the module stays import-safe headless.
    """
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from matplotlib import cm
        from matplotlib.animation import FuncAnimation, PillowWriter
    except Exception:
        return False

    spec = init_spectrum(jnp.asarray(u_wind), resolution, size)
    h0, h0_star, phase0 = seed_field(jax.random.key(seed), spec)
    times = jnp.arange(frames, dtype=jnp.float32) / freq
    disp = np.asarray(synthesize(h0, h0_star, phase0, times, amplitude,
                                 resolution, size))

    fig, ax = plt.subplots(subplot_kw={"projection": "3d"},
                           figsize=(8, 8))
    lin = np.linspace(-1, 1, resolution)
    X, Y = np.meshgrid(lin, lin)

    def draw(i):
        ax.clear()
        dx, dy, dz = disp[i, ..., 0], disp[i, ..., 1], disp[i, ..., 2]
        surf = ax.plot_surface(X + dx, Y + dy, dz, rstride=4, cstride=4,
                               linewidth=0, cmap=cm.coolwarm,
                               antialiased=False)
        ax.set_zlim(-1.01, 1.01)
        return surf

    ani = FuncAnimation(fig, draw, frames=frames, interval=1,
                        blit=False, repeat=True)
    ani.save(path, dpi=72, writer=PillowWriter(fps=fps))
    plt.close(fig)
    return True
