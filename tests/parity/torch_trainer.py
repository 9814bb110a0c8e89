"""f64 PyTorch replica of the TRAINING dynamics (round-3 VERDICT #3).

Round 2 built an f64 torch replica of the reference's ESTIMATOR semantics
(torch_oracle.py) and measured agreement at fixed weights. The remaining
in-env de-risk of the 0.1-nat north star is the TRAINER: if the reference's
Adam / burn-in / KL composition shifted the optimum (not just the
estimator), fixed-weight parity would not catch it. This module closes
that: a from-scratch float64 PyTorch VAE + Adam training loop with the
reference trainer semantics (SURVEY §3.1, ``mt/mvae/trainer.py``
[UNVERIFIED] — Adam(lr), separate curvature lr, curvature frozen for
``burnin_epochs``, single-sample MC KL, principal-branch densities), driven
by THE EXACT SAME initial weights, data order, binarization draws and
reparameterization noise as mvae_tpu's Trainer (mirrored from its threefry
key chain by :func:`epoch_noise` — trainer.py:331-338, 158-163;
models/vae.py:144-152; distributions/{normal,wrapped_normal,
von_mises_fisher}.py sample key usage). After N epochs the two frameworks'
trained weights are compared on the SAME evaluation instrument
(full-split IWAE with fixed binarization, 0.002-nat noise floor).

Supported components (the parity trio e6 / h6 / h2,s2,e2): Euclidean
normal (analytic KL), wrapped normal on the Lorentz hyperboloid (learnable
curvature K = -exp(c)), and von Mises-Fisher on S^2 (m = 3, where the
cosine marginal has a closed-form inverse CDF and log C_3, A_3 are
elementary — so the torch draw is exactly reparameterized with plain
autograd, no scipy in the gradient path).

Everything here is deliberately plain-torch f64 (the reference family's
regime), independent of mvae_tpu's series/sanitized-where machinery.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch

DT = torch.float64
_LOG_2PI = math.log(2.0 * math.pi)


# --------------------------------------------------------------- noise mirror


def epoch_noise(key, comps, global_step0: int, steps: int, bs: int,
                data_shape, n_train: int):
    """Mirror ONE epoch of the Trainer's threefry stream (train_rng=
    'threefry'): returns (next_key, perm, per-step noise dicts). `comps`
    is a list of ('e'|'h'|'s', dim) pairs in component order."""
    key, k_perm, k_epoch = jax.random.split(key, 3)
    perm = np.asarray(jax.random.permutation(k_perm, n_train)[:steps * bs])
    step_noises = []
    for s in range(steps):
        kstep = jax.random.fold_in(k_epoch, global_step0 + s)
        k_bin, k_model = jax.random.split(kstep)
        u_bin = np.asarray(jax.random.uniform(
            k_bin, (bs,) + tuple(data_shape), dtype=jnp.float32))
        comp_keys = jax.random.split(k_model, len(comps))
        noise = {"u_bin": u_bin, "comps": []}
        for (kind, dim), ck in zip(comps, comp_keys):
            if kind in ("e", "h"):
                noise["comps"].append(
                    {"eps": np.asarray(jax.random.normal(
                        ck, (bs, dim), jnp.float32))})
            elif kind == "s":
                k_w, k_dir = jax.random.split(ck)
                noise["comps"].append({
                    "u": np.asarray(jax.random.uniform(
                        k_w, (bs,), dtype=jnp.float32, minval=1e-7)),
                    "g": np.asarray(jax.random.normal(
                        k_dir, (bs, dim), jnp.float32)),
                })
            else:
                raise ValueError(kind)
        step_noises.append(noise)
    return key, perm, step_noises


# ------------------------------------------------------- tensor-k geometry
# torch_oracle.py's formulas take python-float k; training needs k in the
# autograd graph (learnable curvature), so the Lorentz path is restated
# here with tensor k.


def _lprod(x, y):
    return (-x[..., :1] * y[..., :1]
            + (x[..., 1:] * y[..., 1:]).sum(-1, keepdim=True))


def lorentz_exp_mu0_t(v, k):
    r = 1.0 / torch.sqrt(-k)
    vn = torch.linalg.vector_norm(v, dim=-1, keepdim=True).clamp_min(1e-300)
    theta = vn / r
    return torch.cat([r * torch.cosh(theta),
                      r * torch.sinh(theta) * v / vn], dim=-1)


def lorentz_sample_projection_mu0_t(v, mu, k):
    rsq = -1.0 / k
    r = torch.sqrt(rsq)
    v_amb = torch.cat([torch.zeros_like(v[..., :1]), v], dim=-1)
    mu0 = torch.cat([r.expand(*mu.shape[:-1], 1),
                     torch.zeros_like(mu[..., 1:])], dim=-1)
    alpha = -_lprod(mu0, mu) / rsq
    coef = _lprod(mu, v_amb) / (rsq * (1.0 + alpha))
    u = v_amb + coef * (mu0 + mu)
    un = torch.sqrt(_lprod(u, u).clamp_min(1e-300))
    theta = un / r
    return torch.cosh(theta) * mu + torch.sinh(theta) * r * u / un


def lorentz_inverse_sample_projection_mu0_t(z, mu, k):
    rsq = -1.0 / k
    r = torch.sqrt(rsq)
    mu0 = torch.cat([r.expand(*mu.shape[:-1], 1),
                     torch.zeros_like(mu[..., 1:])], dim=-1)
    beta = (-_lprod(mu, z) / rsq).clamp_min(1.0 + 1e-15)
    d = r * torch.acosh(beta)
    u_dir = z - beta * mu
    un = torch.sqrt(_lprod(u_dir, u_dir).clamp_min(1e-300))
    u = d * u_dir / un
    alpha = -_lprod(mu0, mu) / rsq
    coef = _lprod(mu0, u) / (rsq * (1.0 + alpha))
    v_amb = u + coef * (mu0 + mu)
    return v_amb[..., 1:]


def sphere_exp_mu0_t(v, k):
    r = 1.0 / torch.sqrt(k)
    vn = torch.linalg.vector_norm(v, dim=-1, keepdim=True).clamp_min(1e-300)
    theta = vn / r
    return torch.cat([r * torch.cos(theta),
                      r * torch.sin(theta) * v / vn], dim=-1)


def gaussian_log_prob_t(v, sigma):
    sigma = torch.broadcast_to(sigma, v.shape)
    return (-0.5 * ((v / sigma) ** 2 + _LOG_2PI)
            - torch.log(sigma)).sum(-1)


def lorentz_logdet_t(r, n, k):
    c = torch.sqrt(-k)
    x = (r * c).clamp_min(1e-30)
    return (n - 1) * (torch.log(torch.sinh(x)) - torch.log(x))


# closed-form S^2 vMF pieces (m = 3), all differentiable in kappa
def vmf3_log_c(kappa):
    """log C_3(kappa) = log kappa - log(4 pi sinh kappa), in the
    overflow-free form log(kappa) - log(4 pi) - [kappa + log1p(-e^{-2k})
    - log 2]."""
    return (torch.log(kappa) - math.log(4.0 * math.pi)
            - (kappa + torch.log1p(-torch.exp(-2.0 * kappa))
               - math.log(2.0)))


def vmf3_mean_resultant(kappa):
    """A_3(kappa) = coth(kappa) - 1/kappa."""
    return 1.0 / torch.tanh(kappa) - 1.0 / kappa


def vmf3_kl_to_uniform(kappa):
    unit_area = math.log(4.0 * math.pi)
    return kappa * vmf3_mean_resultant(kappa) + vmf3_log_c(kappa) + unit_area


def vmf3_sample_w(u, kappa):
    """Closed-form inverse-CDF cosine on S^2 — the same expm1/log1p form as
    distributions/von_mises_fisher._sample_w_m3 (f64)."""
    kap = kappa.clamp_min(1e-6)
    w = 1.0 + torch.log1p((1.0 - u) * torch.expm1(-2.0 * kap)) / kap
    return w.clamp(-1.0 + 1e-7, 1.0 - 1e-7)


def householder_rotate_t(zprime, mu_unit):
    e1 = torch.zeros_like(mu_unit)
    e1[..., 0] = 1.0
    u = e1 - mu_unit
    un = torch.linalg.vector_norm(u, dim=-1, keepdim=True)
    u_hat = u / un.clamp_min(1e-12)
    reflected = zprime - 2.0 * (u_hat * zprime).sum(-1, keepdim=True) * u_hat
    return torch.where(un < 1e-12, zprime, reflected)


# ------------------------------------------------------------------ the VAE


def _to_t(a, grad=False):
    # np.array copy: jax buffers expose read-only numpy views and torch
    # cannot wrap non-writable memory without UB warnings
    out = torch.as_tensor(np.array(a), dtype=DT)
    if grad:
        out = out.clone().requires_grad_(True)
    return out


class TorchVAEReplica:
    """Mirror of mvae_tpu's (MLP VAE, product latent) in f64 torch.

    comps: list of dicts {kind: 'e'|'h'|'s', dim, fixed_curvature} in
    component order. Initial weights come from the jax params pytree
    (vae.init_params layout)."""

    def __init__(self, jax_params, comps, beta=1.0):
        self.beta = float(beta)
        self.enc = [{k: _to_t(v, True) for k, v in lyr.items()}
                    for lyr in jax_params["encoder"]["layers"]]
        dec = jax_params["decoder"]
        self.dec = [{k: _to_t(v, True) for k, v in lyr.items()}
                    for lyr in dec["layers"]]
        self.dec_out = {k: _to_t(v, True) for k, v in dec["out"].items()}
        self.comps = []
        for spec, cp in zip(comps, jax_params["components"]):
            entry = {"kind": spec["kind"], "dim": int(spec["dim"]),
                     "fixed": bool(spec.get("fixed_curvature", True))}
            for name in ("w_mu", "b_mu", "w_sig", "b_sig"):
                entry[name] = _to_t(cp[name], True)
            if "c_param" in cp:
                entry["c_param"] = _to_t(cp["c_param"], True)
            self.comps.append(entry)

    # --- parameter access ----------------------------------------------------

    def net_params(self):
        out = []
        for lyr in self.enc + self.dec + [self.dec_out]:
            out.extend([lyr["w"], lyr["b"]])
        for c in self.comps:
            out.extend([c["w_mu"], c["b_mu"], c["w_sig"], c["b_sig"]])
        return out

    def curv_params(self):
        return [c["c_param"] for c in self.comps if "c_param" in c]

    def curvature(self, c):
        if c["kind"] == "e":
            return None
        sign = {"h": -1.0, "s": 1.0}[c["kind"]]
        return sign * torch.exp(c["c_param"])

    def to_jax_params(self, like):
        """Trained torch weights -> jax pytree with `like`'s structure."""
        enc = {"layers": tuple(
            {"w": np.asarray(l["w"].detach(), np.float32),
             "b": np.asarray(l["b"].detach(), np.float32)}
            for l in self.enc)}
        dec = {"layers": tuple(
            {"w": np.asarray(l["w"].detach(), np.float32),
             "b": np.asarray(l["b"].detach(), np.float32)}
            for l in self.dec),
            "out": {"w": np.asarray(self.dec_out["w"].detach(), np.float32),
                    "b": np.asarray(self.dec_out["b"].detach(), np.float32)}}
        new_comps = []
        for c, cp in zip(self.comps, like["components"]):
            entry = {name: np.asarray(c[name].detach(), np.float32)
                     for name in ("w_mu", "b_mu", "w_sig", "b_sig")}
            if "c_param" in cp:
                entry["c_param"] = np.asarray(c["c_param"].detach(),
                                              np.float32)
            new_comps.append(entry)
        return jax.tree.map(
            jnp.asarray,
            {"encoder": enc, "decoder": dec, "components": tuple(new_comps)})

    # --- forward -------------------------------------------------------------

    def encode(self, x):
        h = x
        for lyr in self.enc:
            h = torch.relu(h @ lyr["w"] + lyr["b"])
        return h

    def decode(self, z):
        h = z
        for lyr in self.dec:
            h = torch.relu(h @ lyr["w"] + lyr["b"])
        return h @ self.dec_out["w"] + self.dec_out["b"]

    def _component_draw(self, c, feats, noise):
        """(z, log_q, log_p, kl) for one component — reference semantics
        (principal branch, single-sample MC KL except e/vMF analytic)."""
        raw_mu = feats @ c["w_mu"] + c["b_mu"]
        raw_sig = feats @ c["w_sig"] + c["b_sig"]
        if c["kind"] == "e":
            mu = raw_mu
            sigma = torch.nn.functional.softplus(raw_sig)
            eps = _to_t(noise["eps"])
            z = mu + sigma * eps
            log_q = gaussian_log_prob_t(z - mu, sigma)
            log_p = gaussian_log_prob_t(z, torch.ones((), dtype=DT))
            kl = 0.5 * (sigma ** 2 + mu ** 2 - 1.0
                        - 2.0 * torch.log(sigma)).sum(-1)
            return z, log_q, log_p, kl
        if c["kind"] == "h":
            k = self.curvature(c)
            n = c["dim"]
            mu = lorentz_exp_mu0_t(raw_mu, k)
            sigma = torch.nn.functional.softplus(raw_sig)
            v = sigma * _to_t(noise["eps"])
            z = lorentz_sample_projection_mu0_t(v, mu, k)
            v_p = lorentz_inverse_sample_projection_mu0_t(z, mu, k)
            r_p = torch.linalg.vector_norm(v_p, dim=-1)
            log_q = (gaussian_log_prob_t(v_p, sigma)
                     - lorentz_logdet_t(r_p, n, k))
            v0 = lorentz_inverse_sample_projection_mu0_t(
                z, torch.cat([1.0 / torch.sqrt(-k).expand(*z.shape[:-1], 1),
                              torch.zeros_like(z[..., 1:])], dim=-1), k)
            r0 = torch.linalg.vector_norm(v0, dim=-1)
            log_p = (gaussian_log_prob_t(v0, torch.ones((), dtype=DT))
                     - lorentz_logdet_t(r0, n, k))
            return z, log_q, log_p, log_q - log_p
        assert c["kind"] == "s", c["kind"]
        k = self.curvature(c)
        mu = sphere_exp_mu0_t(raw_mu, k)   # ambient (B, 3) on radius-R
        kappa = torch.nn.functional.softplus(raw_sig).squeeze(-1) + 1.0
        w = vmf3_sample_w(_to_t(noise["u"]), kappa)
        g = _to_t(noise["g"])
        v = g / torch.linalg.vector_norm(g, dim=-1, keepdim=True).clamp_min(
            1e-30)
        sin_w = torch.sqrt((1.0 - w * w).clamp_min(1e-38))
        zprime = torch.cat([w[..., None], sin_w[..., None] * v], dim=-1)
        mu_unit = mu / torch.linalg.vector_norm(mu, dim=-1,
                                                keepdim=True).clamp_min(1e-30)
        z_unit = householder_rotate_t(zprime, mu_unit)
        r = 1.0 / torch.sqrt(k)
        z = z_unit * r
        cos = (mu_unit * z_unit).sum(-1)
        r_area = torch.log(k)  # (m-1)/2 log k at m = 3
        log_q = vmf3_log_c(kappa) + kappa * cos + r_area
        log_p = -(math.log(4.0 * math.pi) - torch.log(k))
        kl = vmf3_kl_to_uniform(kappa)
        return z, log_q, log_p, kl

    def forward(self, x_bin, noise):
        """Per-example (elbo, log_px, kl_total); x_bin (B, D) f64."""
        feats = self.encode(x_bin)
        zs, kls = [], []
        for c, cn in zip(self.comps, noise["comps"]):
            z, _lq, _lp, kl = self._component_draw(c, feats, cn)
            zs.append(z)
            kls.append(kl)
        z = torch.cat(zs, dim=-1)
        logits = self.decode(z)
        log_px = (x_bin * logits
                  - torch.nn.functional.softplus(logits)).sum(-1)
        kl_total = sum(kls)
        return log_px - self.beta * kl_total, log_px, kl_total


class TorchTrainerReplica:
    """Adam + curvature burn-in, mirroring mvae_tpu.train.Trainer
    (trainer.py:97-117 make_optimizer/_mask_curvature_grads)."""

    def __init__(self, model: TorchVAEReplica, lr=1e-3, curvature_lr=1e-4,
                 burnin_epochs=10, steps_per_epoch=1):
        self.model = model
        groups = [{"params": model.net_params(), "lr": lr}]
        curv = model.curv_params()
        if curv:
            groups.append({"params": curv, "lr": curvature_lr})
        self.opt = torch.optim.Adam(groups, betas=(0.9, 0.999), eps=1e-8)
        self.burnin_steps = burnin_epochs * steps_per_epoch
        self.step = 0

    def train_step(self, x_bin, noise):
        self.opt.zero_grad(set_to_none=False)
        elbo, log_px, kl = self.model.forward(x_bin, noise)
        loss = -elbo.mean()
        loss.backward()
        for c in self.model.comps:
            if "c_param" not in c:
                continue
            if c["fixed"] or self.step < self.burnin_steps:
                # keep grad present-but-zero: Adam still advances this
                # param's step/moment decay, exactly like the traced mask
                # in trainer.py:104-117 feeding zeros through optax.adam
                c["c_param"].grad = torch.zeros_like(c["c_param"])
        self.opt.step()
        self.step += 1
        return {"loss": float(loss.detach()),
                "elbo": float(elbo.mean().detach()),
                "bce": float(-log_px.mean().detach()),
                "kl": float(kl.mean().detach())}

    def train_epoch(self, train_data, perm, step_noises, bs):
        stats = None
        for s, noise in enumerate(step_noises):
            rows = perm[s * bs:(s + 1) * bs]
            x = _to_t(train_data[rows])
            # binarize in the data shape (u_bin mirrors the Trainer's
            # (bs,)+data_shape draw), then flatten for the MLP exactly as
            # vae.encode does
            x_bin = (_to_t(noise["u_bin"]) < x).to(DT).reshape(len(rows), -1)
            stats = self.train_step(x_bin, noise)
        return stats
