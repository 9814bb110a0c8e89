"""Dissect the single bad fused IWAE log-weight (example 8535, sample 175)
found by probe_d2p2e2_eval_nan.py: recompute the chunk pieces (zt, log_q,
log_p, decode) and report which is non-finite and the draw geometry."""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

RUN = "runs/r4_matrix/d2p2e2-learnK_mnist"
EX, SAMPLE = 8535, 175


def main():
    import jax
    import jax.numpy as jnp

    from mvae_tpu.components import parse_components
    from mvae_tpu.data import load_dataset
    from mvae_tpu.models import VAEConfig, vae
    from mvae_tpu.train import TrainConfig, Trainer
    from mvae_tpu.train.trainer import binarize_rows

    components = parse_components("d2,p2,e2", fixed_curvature=False)
    dataset = load_dataset("mnist")
    model_cfg = VAEConfig(components=components,
                          data_shape=dataset.data_shape, arch="mlp",
                          h_dim=400)
    tc = TrainConfig(epochs=100, batch_size=256, seed=11,
                     eval_binarize="fixed")
    trainer = Trainer(model_cfg, dataset, tc, RUN)
    trainer.restore_checkpoint()

    data = trainer._test_data
    bs = min(tc.eval_batch_size, len(data))
    batches, _, n = trainer._split_batches(data, bs)
    k_bins, k_models = trainer._eval_keys(batches.shape[0], bs)
    bi, off = divmod(EX, bs)
    xb = binarize_rows(k_bins[bi], batches[bi], trainer.dataset.binarize)
    km = k_models[bi]

    # replicate _log_weights' fused chunking: chunk=125, 4 chunks
    n_samples, chunk = tc.likelihood_n, 125
    assert n_samples % chunk == 0
    keys = jax.random.split(km, n_samples // chunk)
    ci, si = divmod(SAMPLE, chunk)
    ck = keys[ci]
    feats = vae.encode(model_cfg, trainer.params, xb)
    zt, log_q, log_p = vae._reparam_chunk_t(ck, model_cfg, trainer.params,
                                            feats, chunk)
    zt, log_q, log_p = map(np.asarray, (zt, log_q, log_p))
    print("zt", zt.shape, "log_q", log_q.shape)
    print("sample", SAMPLE, "chunk", ci, "slot", si, "col", off)
    print("z row:", zt[si, :, off])
    print("log_q:", log_q[si, off], "log_p:", log_p[si, off])

    # which component contributes the non-finite piece? redo per component
    from mvae_tpu.kernels import manifold_kernels
    raws = vae._fused_head_raw(model_cfg, trainer.params, feats)
    for i, (comp, cp, raw) in enumerate(zip(model_cfg.components,
                                            trainer.params["components"],
                                            raws)):
        if not vae._fused_reparam_eligible(comp, cp):
            print(f"{comp.name}#{i}: jnp path"); continue
        mu, scale, k = comp.posterior_params_from_raw(cp, raw)
        sig_t = jnp.broadcast_to(scale, mu.shape).T
        eps = jax.random.normal(jax.random.fold_in(ck, i),
                                (comp.dim, chunk, mu.shape[0]), mu.dtype)
        ztc, lq, lp = manifold_kernels.wrapped_reparam_stereo_t(
            eps, mu.T, sig_t, k, wraps=comp.wraps,
            sign=comp.manifold.curvature_sign)
        ztc, lq, lp = map(np.asarray, (ztc, lq, lp))
        e = np.asarray(eps)[:, si, off]
        s = np.asarray(sig_t)[:, off]
        r = float(np.linalg.norm(e * s))
        K = float(np.asarray(comp.manifold.curvature(cp["c_param"])))
        piR = float(np.pi / np.sqrt(abs(K))) if K > 0 else float("inf")
        print(f"{comp.name}#{i}: K={K:.6f} piR={piR:.9f} r={r:.9f} "
              f"r-piR={r-piR:.3e} z={ztc[:, si, off]} "
              f"lq={lq[si, off]} lp={lp[si, off]}")
        bad = np.argwhere(~np.isfinite(lq) | ~np.isfinite(lp)
                          | ~np.isfinite(ztc).all(axis=0))
        print(f"   non-finite (slot,col) entries: {bad[:5].tolist()} "
              f"count={len(bad)}")


if __name__ == "__main__":
    main()
