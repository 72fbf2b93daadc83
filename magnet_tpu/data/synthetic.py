"""Synthetic PDE dataset generation (1D combined equation, 2D Burgers).

The reference repo ships no data generation (its datasets come from the
Brandstetter et al. solver); this module provides a self-contained
pseudo-spectral generator producing HDF5 files with the exact schema the
reference readers expect (reference datamodule/dataset.py:25-30:
``f[mode][f'pde_{nt}-{nx}']`` + ``x``/``t``; dataset_2d.py:40-51,259-263:
``pde_{nt}-{res}`` + ``x``/``y``/``coords``/``t``/``dx``/``dy``/``dt``), so
the whole pipeline — including zero-shot super-resolution splits — can be
exercised and benchmarked without external files.

1D: u_t + u u_x = nu u_xx  (+ optional linear dispersion), periodic on [0,L).
2D: scalar Burgers u_t + u (u_x + u_y) = nu (u_xx + u_yy), periodic.

Solved with a dealiased Fourier pseudo-spectral method and RK4 in time at a
fine internal resolution, then subsampled to the requested (nt, nx).
"""
from __future__ import annotations

import os

import h5py
import numpy as np


def _initial_condition_1d(rng, n, n_modes=5, lmax=3):
    k = rng.integers(1, lmax + 1, size=n_modes)
    amp = rng.uniform(-0.5, 0.5, size=n_modes)
    phase = rng.uniform(0, 2 * np.pi, size=n_modes)
    x = np.arange(n) / n
    u = np.zeros(n)
    for a, kk, p in zip(amp, k, phase):
        u += a * np.sin(2 * np.pi * kk * x + p)
    return u


class _Forcing1D:
    """Brandstetter et al. 2022 forcing δ(t, x) = Σ_j A_j sin(ω_j t +
    2π ℓ_j x / L + φ_j) with J=5, A~U(-0.5,0.5), ω~U(-0.4,0.4),
    ℓ ∈ {1,2,3}, φ~U(0,2π).  The initial condition is u(0,·) = δ(0,·)."""

    def __init__(self, rng, length, n_modes=5, lmax=3):
        self.A = rng.uniform(-0.5, 0.5, n_modes)
        self.omega = rng.uniform(-0.4, 0.4, n_modes)
        self.ell = rng.integers(1, lmax + 1, n_modes)
        self.phi = rng.uniform(0, 2 * np.pi, n_modes)
        self.length = length

    def __call__(self, t, x):
        """x (n,) physical coords in [0, L)."""
        out = np.zeros_like(x)
        for a, w, l, p in zip(self.A, self.omega, self.ell, self.phi):
            out += a * np.sin(w * t + 2 * np.pi * l * x / self.length + p)
        return out


# (α, β, γ) presets of the combined equation
#   ∂_t u + ∂_x(α u² − β ∂_x u + γ ∂_xx u) = δ(t, x)
# (Brandstetter et al. 2022, the source of the reference's CE_* datasets,
# reference README.md:34-60):
#   E1: Burgers without diffusion (0.5, 0, 0)
#   E2: Burgers with variable diffusion (0.5, η, 0), η ~ U(0, 0.2)
#   E3: fully mixed, α ~ U(0, 3), β ~ U(0, 0.4), γ ~ U(0, 1)
def _ce_params(eq: str, rng) -> tuple[float, float, float]:
    if eq == "E1":
        return 0.5, 0.0, 0.0
    if eq == "E2":
        return 0.5, float(rng.uniform(0.0, 0.2)), 0.0
    if eq == "E3":
        return (float(rng.uniform(0.0, 3.0)), float(rng.uniform(0.0, 0.4)),
                float(rng.uniform(0.0, 1.0)))
    raise ValueError(f"unknown combined-equation preset {eq!r}")


def _weno5_flux_divergence(u, flux, dflux_max, dx):
    """∂_x f(u) via 5th-order WENO-JS reconstruction with global
    Lax-Friedrichs flux splitting, periodic (vectorized with np.roll).

    The reference's CE_* datasets come from Brandstetter et al.'s solver,
    which uses WENO5 for the convective flux — required for the INVISCID
    E1 (shocks form; a pure spectral method rings/blows up there).
    """
    f = flux(u)
    a = dflux_max
    fp = 0.5 * (f + a * u)        # right-moving part, left-biased stencil
    fm = 0.5 * (f - a * u)        # left-moving part, right-biased stencil

    eps = 1e-6

    def rec_left(g):
        """f̂_{i+1/2} from left-biased stencils of g (for f+)."""
        gm2 = np.roll(g, 2)
        gm1 = np.roll(g, 1)
        g0 = g
        gp1 = np.roll(g, -1)
        gp2 = np.roll(g, -2)
        p0 = (2 * gm2 - 7 * gm1 + 11 * g0) / 6
        p1 = (-gm1 + 5 * g0 + 2 * gp1) / 6
        p2 = (2 * g0 + 5 * gp1 - gp2) / 6
        b0 = (13 / 12) * (gm2 - 2 * gm1 + g0) ** 2 + 0.25 * (
            gm2 - 4 * gm1 + 3 * g0
        ) ** 2
        b1 = (13 / 12) * (gm1 - 2 * g0 + gp1) ** 2 + 0.25 * (gm1 - gp1) ** 2
        b2 = (13 / 12) * (g0 - 2 * gp1 + gp2) ** 2 + 0.25 * (
            3 * g0 - 4 * gp1 + gp2
        ) ** 2
        a0 = 0.1 / (eps + b0) ** 2
        a1 = 0.6 / (eps + b1) ** 2
        a2 = 0.3 / (eps + b2) ** 2
        s = a0 + a1 + a2
        return (a0 * p0 + a1 * p1 + a2 * p2) / s

    fhat_p = rec_left(fp)                       # at i+1/2
    # mirror-symmetric reconstruction for f−: the right-biased estimate at
    # interface i+1/2 equals the left-biased estimate on the reversed
    # array at reversed interface N-2-i ( = roll(rev(rec_left(rev(g))),-1))
    fhat_m = np.roll(rec_left(fm[::-1])[::-1], -1)
    fhat = fhat_p + fhat_m                      # numerical flux at i+1/2
    return (fhat - np.roll(fhat, 1)) / dx


def solve_combined_1d(
    rng, eq="E1", nx_fine=256, nt_out=250, nx_out=None, t_end=4.0,
    length=16.0, n_steps=4000,
):
    """Combined 1D equation (Brandstetter et al. 2022; the reference's
    E1/E2/E3 CE_* datasets):

        ∂_t u + ∂_x(α u² − β ∂_x u + γ ∂_xx u) = δ(t, x),  periodic on [0, L)

    i.e. ∂_t u = −∂_x(α u²) + β ∂_xx u − γ ∂_xxx u + δ.  The convective
    flux is WENO5 (shock-capturing — E1 is inviscid); the linear symbol
    (−β k² + i γ k³) is integrated EXACTLY by a Fourier integrating factor
    (diffusion decayed, dispersion rotated — stable for E3's γ up to 1);
    nonlinearity + forcing advance with IF-RK2.  Domain L = 16, t ∈ [0, 4],
    250 saved frames — the reference datasets' shape.

    Returns (u (nt_out, nx_out), x (nx_out,), t (nt_out,)).
    """
    nx_out = nx_out or nx_fine
    alpha, beta, gamma = _ce_params(eq, rng)
    forcing = _Forcing1D(rng, length)
    dx = length / nx_fine
    xg = np.arange(nx_fine) * dx
    u = forcing(0.0, xg)                                     # u(0,·) = δ(0,·)

    k = 2 * np.pi * np.fft.rfftfreq(nx_fine, d=dx)

    def nonlin(uh, t):
        uu = np.fft.irfft(uh, n=nx_fine)
        a = 2.0 * alpha * max(np.abs(uu).max(), 1e-12)       # max |f'(u)|
        div = _weno5_flux_divergence(uu, lambda v: alpha * v * v, a, dx)
        return np.fft.rfft(-div + forcing(t, xg))

    dt = t_end / n_steps
    save_every = n_steps // nt_out
    lin = -beta * (k**2) + 1j * gamma * (k**3)
    efac = np.exp(lin * dt)
    efac_h = np.exp(lin * (dt / 2))
    uh = np.fft.rfft(u)
    frames = []
    for s in range(n_steps):
        if s % save_every == 0 and len(frames) < nt_out:
            frames.append(np.fft.irfft(uh, n=nx_fine))
        t0 = s * dt
        k1 = nonlin(uh, t0)
        k2 = nonlin(efac_h * (uh + 0.5 * dt * k1), t0 + 0.5 * dt)
        uh = efac * uh + dt * efac_h * k2
    while len(frames) < nt_out:
        frames.append(np.fft.irfft(uh, n=nx_fine))
    u_t = np.stack(frames)                                   # (nt, nx_fine)
    stride = nx_fine // nx_out
    u_out = u_t[:, ::stride][:, :nx_out]
    x = (np.arange(nx_out) * (length / nx_out)).astype(np.float32)
    t = np.linspace(0, t_end, nt_out, endpoint=False).astype(np.float32)
    return u_out.astype(np.float32), x, t


def solve_combined_1d_irregular(
    rng, eq="E1", n_nodes=50, nx_fine=256, nt_out=250, t_end=4.0,
    length=16.0,
):
    """Irregular-mesh variant: solve at the fine regular resolution, then
    keep ``n_nodes`` randomly selected grid points (sorted) — the
    reference's irregular CE_*_graph_* files store per-sample node
    coordinates the same way (datamodule/dataset.py:30, 'x' per sample)."""
    u, x, t = solve_combined_1d(
        rng, eq=eq, nx_fine=nx_fine, nt_out=nt_out, nx_out=nx_fine,
        t_end=t_end, length=length,
    )
    sel = np.sort(rng.choice(nx_fine, n_nodes, replace=False))
    return u[:, sel], x[sel], t


def solve_ks_1d(
    rng, nx_fine=256, nt_out=128, nx_out=None, t_end=32.0, length=64.0,
    burn_in=40.0, dt=0.01,
):
    """Kuramoto-Sivashinsky equation (the reference's KS_train/KS_valid
    datasets, configs/datamodule/h5_datamodule_implicit.yaml:3-8):

        ∂_t u + u ∂_x u + ∂_xx u + ∂_xxxx u = 0,  periodic on [0, L)

    L=64 puts the system deep in the chaotic regime.  The linear symbol
    (k² − k⁴) is integrated exactly by a Fourier integrating factor; the
    conservative nonlinearity −½∂_x(u²) advances with IF-RK2 (dealiased).
    A burn-in window discards the transient so saved trajectories live on
    the chaotic attractor.  Returns (u (nt_out, nx_out), x, t)."""
    nx_out = nx_out or nx_fine
    dx = length / nx_fine
    xg = np.arange(nx_fine) * dx
    u = _initial_condition_1d(rng, nx_fine) * 2.0
    k = 2 * np.pi * np.fft.rfftfreq(nx_fine, d=dx)
    dealias = np.ones_like(k)
    dealias[k > (2 / 3) * k.max()] = 0.0
    lin = k**2 - k**4
    efac = np.exp(lin * dt)
    efac_h = np.exp(lin * (dt / 2))

    def nonlin(uh):
        uu = np.fft.irfft(uh, n=nx_fine)
        return -0.5j * k * np.fft.rfft(uu * uu) * dealias

    uh = np.fft.rfft(u)
    n_burn = int(round(burn_in / dt))
    n_steps = int(round(t_end / dt))
    save_every = n_steps // nt_out
    frames = []
    for s in range(n_burn + n_steps):
        if s >= n_burn and (s - n_burn) % save_every == 0 \
                and len(frames) < nt_out:
            frames.append(np.fft.irfft(uh, n=nx_fine))
        k1 = nonlin(uh)
        k2 = nonlin(efac_h * (uh + 0.5 * dt * k1))
        uh = efac * uh + dt * efac_h * k2
    while len(frames) < nt_out:
        frames.append(np.fft.irfft(uh, n=nx_fine))
    u_t = np.stack(frames)
    stride = nx_fine // nx_out
    u_out = u_t[:, ::stride][:, :nx_out]
    x = (np.arange(nx_out) * (length / nx_out)).astype(np.float32)
    t = np.linspace(0, t_end, nt_out, endpoint=False).astype(np.float32)
    return u_out.astype(np.float32), x, t


def solve_heat_1d(
    rng, nx=256, nt_out=256, t_end=4.0, length=16.0, nu=0.3,
):
    """Heat equation ∂_t u = ν ∂_xx u, periodic — the reference's
    Heat_test.h5 zero-shot PDE-transfer target
    (configs/datamodule/h5_datamodule_implicit.yaml:5, nt_test=256).
    Solved exactly in Fourier space.  Returns (u (nt_out, nx), x, t)."""
    u0 = _initial_condition_1d(rng, nx) * 2.0
    k = 2 * np.pi * np.fft.rfftfreq(nx, d=length / nx)
    uh0 = np.fft.rfft(u0)
    t = np.linspace(0, t_end, nt_out, endpoint=False)
    frames = [
        np.fft.irfft(uh0 * np.exp(-nu * k**2 * ti), n=nx) for ti in t
    ]
    x = (np.arange(nx) * (length / nx)).astype(np.float32)
    return (np.stack(frames).astype(np.float32), x, t.astype(np.float32))


def solve_burgers_1d(
    rng, nx_fine=256, nt_out=250, nx_out=None, t_end=2.0, nu=0.01, length=16.0
):
    """Returns (u (nt_out, nx_out), x (nx_out,), t (nt_out,))."""
    nx_out = nx_out or nx_fine
    u = _initial_condition_1d(rng, nx_fine)
    k = 2 * np.pi * np.fft.rfftfreq(nx_fine, d=length / nx_fine)
    dealias = np.ones_like(k)
    dealias[k > (2 / 3) * k.max()] = 0.0

    def rhs(uh):
        ux = np.fft.irfft(1j * k * uh, n=nx_fine)
        uu = np.fft.irfft(uh, n=nx_fine)
        return -np.fft.rfft(uu * ux) * dealias

    n_steps = 2000
    dt = t_end / n_steps
    save_every = n_steps // nt_out
    # integrating factor: diffusion handled exactly (unconditionally stable)
    efac = np.exp(-nu * (k**2) * dt)
    uh = np.fft.rfft(u)
    frames = []
    for s in range(n_steps):
        if s % save_every == 0 and len(frames) < nt_out:
            frames.append(np.fft.irfft(uh, n=nx_fine))
        k1 = rhs(uh)
        k2 = rhs(uh + 0.5 * dt * k1)
        uh = (uh + dt * k2) * efac
    while len(frames) < nt_out:
        frames.append(np.fft.irfft(uh, n=nx_fine))
    u_t = np.stack(frames)                                   # (nt, nx_fine)
    stride = nx_fine // nx_out
    u_out = u_t[:, ::stride][:, :nx_out]
    x = (np.arange(nx_out) * (length / nx_out)).astype(np.float32)
    t = np.linspace(0, t_end, nt_out, endpoint=False).astype(np.float32)
    return u_out.astype(np.float32), x, t


def solve_burgers_2d(
    rng, w_fine=64, nt_out=50, w_out=None, t_end=1.0, nu=0.02, length=1.0
):
    """Returns (u (nt_out, w_out, w_out), x (w_out,), y (w_out,), t)."""
    w_out = w_out or w_fine
    xg = np.arange(w_fine) / w_fine
    X, Y = np.meshgrid(xg, xg, indexing="ij")
    u = np.zeros((w_fine, w_fine))
    for _ in range(4):
        kx, ky = rng.integers(1, 4, size=2)
        a = rng.uniform(-0.4, 0.4)
        px, py = rng.uniform(0, 2 * np.pi, size=2)
        u += a * np.sin(2 * np.pi * kx * X + px) * np.sin(2 * np.pi * ky * Y + py)

    kvec = 2 * np.pi * np.fft.fftfreq(w_fine, d=length / w_fine)
    KX, KY = np.meshgrid(kvec, kvec, indexing="ij")
    K2 = KX**2 + KY**2
    kmax = np.abs(kvec).max()
    dealias = (np.abs(KX) <= (2 / 3) * kmax) & (np.abs(KY) <= (2 / 3) * kmax)

    def rhs(uh):
        uu = np.real(np.fft.ifft2(uh))
        ux = np.real(np.fft.ifft2(1j * KX * uh))
        uy = np.real(np.fft.ifft2(1j * KY * uh))
        return -np.fft.fft2(uu * (ux + uy)) * dealias

    n_steps = 1000
    dt = t_end / n_steps
    save_every = n_steps // nt_out
    efac = np.exp(-nu * K2 * dt)
    uh = np.fft.fft2(u)
    frames = []
    for s in range(n_steps):
        if s % save_every == 0 and len(frames) < nt_out:
            frames.append(np.real(np.fft.ifft2(uh)))
        k1 = rhs(uh)
        k2 = rhs(uh + 0.5 * dt * k1)
        uh = (uh + dt * k2) * efac
    while len(frames) < nt_out:
        frames.append(np.real(np.fft.ifft2(uh)))
    u_t = np.stack(frames)
    stride = w_fine // w_out
    u_out = u_t[:, ::stride, ::stride][:, :w_out, :w_out]
    x = (np.arange(w_out) * (length / w_out)).astype(np.float32)
    t = np.linspace(0, t_end, nt_out, endpoint=False).astype(np.float32)
    return u_out.astype(np.float32), x, x.copy(), t


def generate_1d_file(
    path, n_train=16, n_valid=4, n_test=4, nt=250, nx=50, seed=0, t_end=2.0,
    nu=0.05, eq=None, n_steps=4000,
):
    """Write a 1D HDF5 file in the reference schema (CE_* layout).

    ``eq`` None keeps the fast plain-Burgers generator (unit tests);
    'E1'/'E2'/'E3' uses the combined-equation solver (the reference's
    actual dataset family); 'KS' / 'Heat' produce the
    Kuramoto-Sivashinsky train and heat-equation transfer-test sets of
    the reference's 1D implicit protocol
    (configs/datamodule/h5_datamodule_implicit.yaml)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    rng = np.random.default_rng(seed)
    with h5py.File(path, "w") as f:
        for mode, n in [("train", n_train), ("valid", n_valid), ("test", n_test)]:
            us, xs, ts = [], [], []
            for _ in range(n):
                if eq is None:
                    u, x, t = solve_burgers_1d(
                        rng, nx_fine=max(256, nx), nt_out=nt, nx_out=nx,
                        t_end=t_end, nu=nu,
                    )
                elif eq == "KS":
                    u, x, t = solve_ks_1d(
                        rng, nx_fine=max(256, nx), nt_out=nt, nx_out=nx,
                    )
                elif eq == "Heat":
                    u, x, t = solve_heat_1d(rng, nx=nx, nt_out=nt)
                else:
                    nx_fine = nx * max(8, -(-256 // nx))
                    u, x, t = solve_combined_1d(
                        rng, eq=eq, nx_fine=nx_fine, nt_out=nt, nx_out=nx,
                        n_steps=n_steps,
                    )
                us.append(u)
                xs.append(x)
                ts.append(t)
            g = f.create_group(mode)
            g.create_dataset(f"pde_{nt}-{nx}", data=np.stack(us))
            g.create_dataset("x", data=np.stack(xs))
            g.create_dataset("t", data=np.stack(ts))
    return path


def generate_ce_suite(
    root,
    eq: str = "E1",
    n_train=64,
    n_valid=16,
    n_test=16,
    nt=250,
    resolutions=(50, 100, 200, 40),
    train_resolution=50,
    irregular_nodes=(),
    nx_fine=400,
    seed=0,
    n_steps=4000,
):
    """Regenerate the reference's E1/E2/E3 dataset tree (README.md:34-60)
    with the actual combined-equation solver.

    Writes, under ``root`` (e.g. data/1d/E1):
      regular/CE_train_{eq}_{train_resolution}.h5   (train+valid+test groups)
      regular/CE_test_{eq}_{r}.h5 for every r in resolutions
      irregular/CE_train_{eq}_graph_{n}.h5 for n in irregular_nodes
      irregular/CE_test_{eq}_graph_{r}.h5 for r in resolutions
    Every resolution of a split is a downsampling of the SAME fine solves,
    so zero-shot super-resolution evaluation compares identical
    trajectories across resolutions.
    """
    rng = np.random.default_rng(seed)
    splits = {}
    for mode, n in [("train", n_train), ("valid", n_valid), ("test", n_test)]:
        sols = []
        for _ in range(n):
            u, x, t = solve_combined_1d(
                rng, eq=eq, nx_fine=nx_fine, nt_out=nt, nx_out=nx_fine,
                n_steps=n_steps,
            )
            sols.append((u, x, t))
        splits[mode] = sols

    def down(u, x, nx_out):
        stride = nx_fine // nx_out
        return u[:, ::stride][:, :nx_out], x[::stride][:nx_out]

    def write(path, groups, nx_out, irregular_n=None):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with h5py.File(path, "w") as f:
            for mode, sols in groups.items():
                us, xs, ts = [], [], []
                for u, x, t in sols:
                    if irregular_n is not None:
                        sel = np.sort(
                            rng.choice(nx_fine, irregular_n, replace=False)
                        )
                        us.append(u[:, sel])
                        xs.append(x[sel])
                    else:
                        ud, xd = down(u, x, nx_out)
                        us.append(ud)
                        xs.append(xd)
                    ts.append(t)
                g = f.create_group(mode)
                tag = irregular_n if irregular_n is not None else nx_out
                g.create_dataset(f"pde_{nt}-{tag}", data=np.stack(us))
                g.create_dataset("x", data=np.stack(xs))
                g.create_dataset("t", data=np.stack(ts))
        return path

    out = []
    out.append(write(
        os.path.join(root, "regular", f"CE_train_{eq}_{train_resolution}.h5"),
        splits, train_resolution,
    ))
    for r in resolutions:
        out.append(write(
            os.path.join(root, "regular", f"CE_test_{eq}_{r}.h5"),
            {"train": splits["test"], "valid": splits["valid"],
             "test": splits["test"]},
            r,
        ))
    for n_nodes in irregular_nodes:
        out.append(write(
            os.path.join(root, "irregular", f"CE_train_{eq}_graph_{n_nodes}.h5"),
            splits, None, irregular_n=n_nodes,
        ))
    return out


def generate_2d_file(
    path,
    n_train=8,
    n_valid=2,
    n_test=2,
    nt=50,
    res=32,
    seed=0,
    t_end=1.0,
    nu=0.02,
    irregular=False,
    n_nodes=None,
    concentrated=False,
):
    """Write a 2D HDF5 file in the reference schema.

    regular: keys x, y (per-dim coords) + dx/dy/dt (for the FNO reader).
    irregular: additionally subsamples ``n_nodes`` random grid points and
    stores their coords under 'coords' with pde shaped (n, nt, n_nodes)
    (reference dataset_2d.py:50,99-100). ``concentrated`` biases the node
    sampling toward a random focus point (stand-in for the reference's
    'concentrated' irregular meshes, scripts/mpnn_2d/
    mpnn_2d_b1_64_irregular_concentrated.sh) instead of uniform.
    """
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    rng = np.random.default_rng(seed)
    with h5py.File(path, "w") as f:
        for mode, n in [("train", n_train), ("valid", n_valid), ("test", n_test)]:
            us, xs, ys, ts, coords_l = [], [], [], [], []
            for _ in range(n):
                u, x, y, t = solve_burgers_2d(
                    rng, w_fine=max(64, res), nt_out=nt, w_out=res,
                    t_end=t_end, nu=nu,
                )
                if irregular:
                    nn = n_nodes or (res * res // 2)
                    grid = np.stack(np.meshgrid(x, y, indexing="ij"), -1).reshape(-1, 2)
                    if concentrated:
                        focus = grid[rng.integers(res * res)]
                        d2 = ((grid - focus) ** 2).sum(-1)
                        w = np.exp(-d2 / (2 * 0.15**2))
                        p = w / w.sum()
                        sel = np.sort(rng.choice(res * res, nn, replace=False, p=p))
                    else:
                        sel = np.sort(rng.choice(res * res, nn, replace=False))
                    coords_l.append(grid[sel])
                    us.append(u.reshape(nt, -1)[:, sel])
                else:
                    us.append(u)
                xs.append(x)
                ys.append(y)
                ts.append(t)
            g = f.create_group(mode)
            tag = n_nodes if irregular else res
            g.create_dataset(f"pde_{nt}-{tag}", data=np.stack(us))
            g.create_dataset("x", data=np.stack(xs))
            g.create_dataset("y", data=np.stack(ys))
            g.create_dataset("t", data=np.stack(ts))
            if irregular:
                g.create_dataset("coords", data=np.stack(coords_l))
            dx = np.full((n, 1), float(xs[0][1] - xs[0][0]), np.float32)
            dt_ = np.full((n, 1), float(ts[0][1] - ts[0][0]), np.float32)
            g.create_dataset("dx", data=dx)
            g.create_dataset("dy", data=dx.copy())
            g.create_dataset("dt", data=dt_)
    return path
