"""Generate the Pinchon-Hoggan J block tables (offline, float64).

The reference obtains these tables from the external ``lie_learn`` package
(lie_vae/lie_tools.py:10-14: ``Jd[l]`` — the constant (2l+1)x(2l+1) block J
of the factorization  D^l(alpha, beta, gamma) = Z(alpha) J Z(beta) J Z(gamma),
where Z is the real z-rotation irrep block, lie_vae/lie_tools.py:195-208).

We derive J from first principles instead of vendoring: J^l is the real
Wigner-D matrix of the involution R_yz (rotation by pi about (0,1,1)/sqrt(2),
which maps z->y) in the real spherical-harmonic basis, because
R_yz Rz(beta) R_yz = Ry(beta)  =>  D(Ry(beta)) = J Z(beta) J.

Method: evaluate real spherical harmonics (quantum-normalized, Condon-Shortley
phase, centered order m = -l..l — the lie_learn convention; at l=1 this gives
J = [[0,1,0],[1,0,0],[0,0,-1]]) at random unit vectors and fit the rep matrix
by least squares in float64. Residuals are ~1e-14; the generated tables are
verified for symmetry, involution (J^2 = I), the z-rotation identity
D(Rz(a)) == Z(a), and the y-rotation factorization before being written.

Run:  python -m lie_vae_tpu.ops._gen_jd [--lmax 16] [--out <path>]
The committed asset ``jd_tables.npz`` is the output of this script.
"""
import argparse
import os

import numpy as np
from scipy.special import sph_harm_y

_R_YZ = np.array([[-1.0, 0.0, 0.0], [0.0, 0.0, 1.0], [0.0, 1.0, 0.0]])


def z_rot_mat(angle, l):
    """Real z-rotation irrep block; layout matches lie_vae/lie_tools.py:195-208."""
    M = np.zeros((2 * l + 1, 2 * l + 1))
    inds = np.arange(0, 2 * l + 1)
    rev = np.arange(2 * l, -1, -1)
    freqs = np.arange(l, -l - 1, -1)
    M[inds, rev] = np.sin(freqs * angle)
    M[inds, inds] = np.cos(freqs * angle)
    return M


def real_sph(l, xyz):
    """Real spherical harmonics (quantum, CS phase, centered m=-l..l).

    Returns (2l+1, N) values at unit vectors xyz (N, 3).
    """
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    theta = np.arccos(np.clip(z, -1.0, 1.0))
    phi = np.arctan2(y, x)
    out = np.zeros((2 * l + 1, xyz.shape[0]))
    for i in range(2 * l + 1):
        m = i - l
        am = abs(m)
        Y = sph_harm_y(l, am, theta, phi)  # complex SH, CS phase included
        if m > 0:
            out[i] = np.sqrt(2.0) * (-1.0) ** m * Y.real
        elif m == 0:
            out[i] = Y.real
        else:
            out[i] = np.sqrt(2.0) * (-1.0) ** am * Y.imag
    return out


def rep_matrix(l, R, rng):
    """Rep matrix D with  Ysph(R x) = D @ Ysph(x),  fit by least squares."""
    n = 8 * (2 * l + 1) + 16
    xyz = rng.normal(size=(n, 3))
    xyz /= np.linalg.norm(xyz, axis=1, keepdims=True)
    A = real_sph(l, xyz)
    B = real_sph(l, xyz @ R.T)
    D, res, *_ = np.linalg.lstsq(A.T, B.T, rcond=None)
    return D.T


def compute_jd(lmax, seed=0):
    rng = np.random.default_rng(seed)
    jd = []
    for l in range(lmax + 1):
        J = rep_matrix(l, _R_YZ, rng)
        dim = 2 * l + 1
        eye = np.eye(dim)
        # verification
        assert np.abs(J - J.T).max() < 1e-10, f"J_{l} not symmetric"
        assert np.abs(J @ J - eye).max() < 1e-10, f"J_{l} not involutive"
        for a in (0.5, 1.7, -2.3):
            Dz = rep_matrix(l, _rot_z(a), rng)
            assert np.abs(Dz - z_rot_mat(a, l)).max() < 1e-9, \
                f"z-rotation mismatch at l={l}"
            Dy = rep_matrix(l, _rot_y(a), rng)
            assert np.abs(J @ z_rot_mat(a, l) @ J - Dy).max() < 1e-9, \
                f"y-factorization mismatch at l={l}"
        # J is symmetric + orthogonal: symmetrize to kill lstsq noise
        J = 0.5 * (J + J.T)
        jd.append(J)
    return jd


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--lmax", type=int, default=16)
    parser.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "jd_tables.npz"))
    args = parser.parse_args()

    jd = compute_jd(args.lmax)
    np.savez(args.out, lmax=np.int64(args.lmax),
             **{f"J{l}": jd[l] for l in range(args.lmax + 1)})
    print(f"Wrote J blocks l=0..{args.lmax} to {args.out}")
    print("J1 =", np.round(jd[1], 12).tolist())


if __name__ == "__main__":
    main()
