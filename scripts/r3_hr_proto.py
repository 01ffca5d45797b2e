"""Numpy prototype: reconstruct Householder (Y, T) from a panel's thin QR.

Identity: Householder QR gives A = (I - Y T Y^T) [R_h; 0] with Y unit lower
trapezoidal, T upper triangular. For the thin factor Q1h = (I-YTY^T)[:, :b]:
    Q1h - [I; 0] = -Y (T Y1^T)          (Y1 = Y[:b], unit lower tri)
which is an LU factorization (L = Y unit lower trap, U = -T Y1^T upper).
Any thin QR (Q1, R) differs by column signs: Q1h = Q1 D, R_h = D R.
So modified-LU of (Q1 - [D; 0]) with on-the-fly sign choice d_j = -sign(u_jj)
yields L = Y, U, and T = -U D L1^{-T}.
"""
import numpy as np

rng = np.random.default_rng(0)
m, b = 1024, 64
A = rng.standard_normal((m, b))

Q1, R = np.linalg.qr(A)
# canonicalize: positive diag (cholqr produces positive-diag R)
s = np.sign(np.diag(R))
Q1 = Q1 * s
R = R * s[:, None]

# --- modified LU of Q1 (top-block serial; signs chosen on the fly) ---
M = Q1.copy()
d = np.zeros(b)
L1 = np.eye(b)
U = np.zeros((b, b))
T1 = M[:b].copy()
for j in range(b):
    d[j] = -np.sign(T1[j, j]) if T1[j, j] != 0 else -1.0
    piv = T1[j, j] - d[j]
    U[j, j:] = T1[j, j:]
    U[j, j] = piv
    if j + 1 < b:
        L1[j + 1:, j] = T1[j + 1:, j] / piv
        T1[j + 1:, j:] -= np.outer(L1[j + 1:, j], U[j, j:])

L2 = Q1[b:] @ np.linalg.inv(U)
Y = np.vstack([L1, L2])
T = -U @ np.diag(d) @ np.linalg.inv(L1).T

# --- checks ---
Qh = np.eye(m) - Y @ T @ Y.T
Rh = d[:, None] * R
print("T upper-tri? ", np.allclose(T, np.triu(T)))
print("orth(Qh)     ", np.linalg.norm(Qh.T @ Qh - np.eye(m)))
print("recon A      ", np.linalg.norm(Qh[:, :b] @ Rh - A) / np.linalg.norm(A))
# trailing-update form used by the driver: C <- C - Y (T^T (Y^T C))
C = rng.standard_normal((m, 32))
C2 = C - Y @ (T.T @ (Y.T @ C))
print("apply QhT    ", np.linalg.norm(C2 - Qh.T @ C))
# growth / stability diagnostics
print("max|L|       ", np.abs(Y).max(), " max|U| ", np.abs(U).max())
