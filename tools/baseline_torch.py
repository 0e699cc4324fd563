"""Measured CPU baseline for bench.py's vs_baseline.

The reference is TF 1.15 graph-mode, which cannot run in this image.  This
script re-creates the reference's north-star training step *as the
reference computes it* — float64, a Python loop over the L=16 latent
channels, explicit jittered matrix inverses, per-channel K_mm
recomputation (SVGPVAE_model.py:303-343, 238-301, 868-879), GECO objective
— in torch (CPU) and measures seconds/step at batch 256.  Torch eager on
CPU is a like-for-like stand-in for TF1's CPU runtime (same BLAS,
comparable dispatch overhead).

Writes {"cpu_step_sec": ...} to BASELINE_MEASURED.json, which bench.py
prefers over its pinned estimate.

Run:  python tools/baseline_torch.py
"""

from __future__ import annotations

import json
import math
import time
from pathlib import Path

import numpy as np
import torch

torch.set_default_dtype(torch.float64)


class MnistVAETorch(torch.nn.Module):
    """Same architecture as the reference mnistVAE (VAE_utils.py:99-162)."""

    def __init__(self, L: int = 16):
        super().__init__()
        self.L = L
        self.enc = torch.nn.ModuleList([
            torch.nn.Conv2d(1, 8, 3, stride=2),
            torch.nn.Conv2d(8, 8, 3, stride=2),
            torch.nn.Conv2d(8, 8, 3, stride=2)])
        self.enc_out = torch.nn.Linear(32, 2 * L)
        self.dec_in = torch.nn.Linear(L, 128)
        self.dec = torch.nn.ModuleList([
            torch.nn.Conv2d(8, 8, 3, padding=1),
            torch.nn.Conv2d(8, 8, 3),
            torch.nn.Conv2d(8, 1, 3, padding=1)])

    def encode(self, x):
        h = x
        for conv in self.enc:
            h = torch.nn.functional.elu(conv(h))
        h = self.enc_out(h.flatten(1))
        return h[:, :self.L], torch.exp(h[:, self.L:])

    def decode(self, z):
        h = self.dec_in(z).reshape(-1, 8, 4, 4)
        up = torch.nn.functional.interpolate
        h = torch.nn.functional.elu(self.dec[0](up(h, scale_factor=2)))
        h = torch.nn.functional.elu(self.dec[1](up(h, scale_factor=2)))
        h = torch.nn.functional.elu(self.dec[2](up(h, scale_factor=2)))
        return h


def kernel_matrix(x_view, x_obj, y_view, y_obj, l_gp, amp):
    d = torch.abs(x_view[:, None] - y_view[None, :])
    k_view = amp**2 * torch.exp(
        -2 * torch.sin(math.pi * d / (2 * math.pi))**2 / l_gp**2)
    return k_view * (x_obj @ y_obj.T)


def main() -> None:
    rng = np.random.RandomState(0)
    b, L, M, m, n_obj, N_train = 256, 16, 8, 32, 400, 4050
    jitter, kappa2, alpha_geco = 1e-6, 0.020, 0.99

    vae = MnistVAETorch(L)
    l_gp = torch.nn.Parameter(torch.tensor(1.0))
    amp = torch.nn.Parameter(torch.tensor(1.0))
    ip = torch.nn.Parameter(torch.tensor(
        np.hstack([rng.rand(m, 1) * 2 * np.pi, rng.randn(m, M)])))
    ov = torch.nn.Parameter(torch.tensor(rng.randn(n_obj, M)))
    params = list(vae.parameters()) + [l_gp, amp, ip, ov]
    opt = torch.optim.Adam(params, lr=1e-3)

    images = torch.tensor(rng.rand(b, 1, 28, 28))
    ids = torch.tensor(rng.randint(0, n_obj, b))
    angles = torch.tensor(rng.rand(b) * 2 * np.pi)

    C_ma = torch.tensor(0.0)
    lagrange = torch.tensor(1.0)
    eye_m = torch.eye(m)

    def step(C_ma, lagrange):
        opt.zero_grad()
        qmu, qvar = vae.encode(images)
        qvar = torch.clamp(qvar, 1e-3, 10.0)
        obj_vecs = ov[ids]

        p_m, p_v = [], []
        inside_recon = 0.0
        inside_kl = 0.0
        scale = N_train / b
        for l in range(L):  # the reference's per-channel loop
            # per-channel recomputation of ALL kernel matrices, as in the
            # reference (posterior AND loss paths)
            for _ in range(2):
                Kmm = kernel_matrix(ip[:, 0], ip[:, 1:], ip[:, 0],
                                    ip[:, 1:], l_gp, amp)
                Kmm_inv = torch.linalg.inv(Kmm + jitter * eye_m)
                Knm = kernel_matrix(angles, obj_vecs, ip[:, 0], ip[:, 1:],
                                    l_gp, amp)
            Knn_diag = amp**2 * (obj_vecs * obj_vecs).sum(1)
            prec = 1.0 / qvar[:, l]
            y = qmu[:, l]

            Sigma = Kmm + scale * Knm.T @ (Knm * prec[:, None])
            Sigma_inv = torch.linalg.inv(Sigma + jitter * eye_m)
            r = Knm.T @ (prec * y)
            p_m_l = scale * Knm @ (Sigma_inv @ r)
            Bd = (Knn_diag - ((Knm @ Kmm_inv) * Knm).sum(1)
                  + ((Knm @ Sigma_inv) * Knm).sum(1))
            mu_hat = scale * Kmm @ (Sigma_inv @ r)
            A_hat = Kmm @ Sigma_inv @ Kmm

            mean_vec = Knm @ (Kmm_inv @ mu_hat)
            k_tilde = prec * (Knn_diag - ((Knm @ Kmm_inv) * Knm).sum(1))
            # reference builds (b, m, m) lambda tensors per channel
            lam = Kmm_inv @ (Knm[:, :, None] * Knm[:, None, :]) @ Kmm_inv
            traces = prec * torch.einsum("bij,ji->b", lam, A_hat)
            sum_term = -0.5 * (k_tilde.sum() + traces.sum()
                               + torch.log(qvar[:, l]).sum()
                               + b * math.log(2 * math.pi)
                               + (prec * (y - mean_vec)**2).sum())
            Kmm_chol = torch.linalg.cholesky(Kmm + jitter * eye_m)
            S_chol = torch.linalg.cholesky(A_hat + jitter * eye_m)
            kl = 0.5 * (2 * torch.log(torch.diagonal(Kmm_chol)).sum()
                        - 2 * torch.log(torch.diagonal(S_chol)).sum() - m
                        + torch.trace(Kmm_inv @ A_hat)
                        + mu_hat @ (Kmm_inv @ mu_hat))
            inside_recon = inside_recon + sum_term
            inside_kl = inside_kl + kl
            p_m.append(p_m_l)
            p_v.append(Bd)

        p_m = torch.stack(p_m, 1)
        p_v = torch.stack(p_v, 1)
        inside_elbo = inside_recon - (b / N_train) * inside_kl

        ce = -0.5 * (math.log(2 * math.pi) + torch.log(p_v)
                     + (qvar + qmu**2 - 2 * qmu * p_m + p_m**2) / p_v)
        kl_term = -ce.sum() + inside_elbo

        z = p_m + torch.randn_like(p_m) * torch.sqrt(torch.clamp(p_v, 0))
        recon = vae.decode(z)
        per_img = ((images - recon)**2).mean(dim=(1, 2, 3))
        recon_loss = (per_img - kappa2).sum()
        C_new = alpha_geco * C_ma + (1 - alpha_geco) * recon_loss / b
        obj = -kl_term + lagrange * (recon_loss / b
                                     + (C_new - recon_loss / b).detach())
        obj.backward()
        opt.step()
        return C_new.detach(), (lagrange * torch.exp(C_new)).detach()

    # warmup
    C_ma, lagrange = step(C_ma, lagrange)
    n_steps = 10
    t0 = time.perf_counter()
    for _ in range(n_steps):
        C_ma, lagrange = step(C_ma, lagrange)
    sec = (time.perf_counter() - t0) / n_steps

    out = {"cpu_step_sec": sec,
           "desc": "torch-f64 CPU re-creation of the reference's "
                   "north-star step (per-channel loops, explicit "
                   "inverses, GECO)"}
    path = Path(__file__).resolve().parent.parent / "BASELINE_MEASURED.json"
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
