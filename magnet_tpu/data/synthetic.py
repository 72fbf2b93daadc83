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
    path, n_train=16, n_valid=4, n_test=4, nt=250, nx=50, seed=0, t_end=2.0, nu=0.05
):
    """Write a 1D HDF5 file in the reference schema (CE_* layout)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    rng = np.random.default_rng(seed)
    with h5py.File(path, "w") as f:
        for mode, n in [("train", n_train), ("valid", n_valid), ("test", n_test)]:
            us, xs, ts = [], [], []
            for _ in range(n):
                u, x, t = solve_burgers_1d(
                    rng, nx_fine=max(256, nx), nt_out=nt, nx_out=nx,
                    t_end=t_end, nu=nu,
                )
                us.append(u)
                xs.append(x)
                ts.append(t)
            g = f.create_group(mode)
            g.create_dataset(f"pde_{nt}-{nx}", data=np.stack(us))
            g.create_dataset("x", data=np.stack(xs))
            g.create_dataset("t", data=np.stack(ts))
    return path


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
