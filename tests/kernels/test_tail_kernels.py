"""Fused training-tail kernel vs jnp-path equivalence (values AND grads).

On CPU the kernel runs in interpreter mode (MVAE_FUSED_TAIL=1 opt-in) —
same kernel code, exact semantics check; the TPU-compiled path is
exercised by bench runs and the driver's entry() compile check.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvae_tpu.components import parse_components, reparametrize
from mvae_tpu.kernels import tail_kernels
from mvae_tpu.models import vae

F32 = jnp.float32
B, F = 160, 24

# vMF is kernel-capable at m = 3 only (the m != 3 wx-operand channel was
# measured slower at every shape incl. large-B s12 and deleted in r5);
# wrapped-on-s covers the higher sphere dims.
SPECS = ["h2,s2,e2", "e6", "h6", "d6", "p6", "u6", "d2,p2,u2",
         "s6:wrapped", "s4:wrapped,s2", "s3:wrapped,h2,e2"]


def build(spec, fixed=False, scalar_sigma=False, wraps=1, seed=0):
    comps = parse_components(spec, fixed_curvature=fixed,
                             scalar_sigma=scalar_sigma, wraps=wraps)
    key = jax.random.key(seed)
    k_init, k_feats, k_rep = jax.random.split(key, 3)
    comp_params = tuple(
        c.init_params(kk, F, 1.0)
        for c, kk in zip(comps, jax.random.split(k_init, len(comps))))
    feats = 0.5 * jax.random.normal(k_feats, (B, F), F32)
    raws = [jnp.concatenate([feats @ cp["w_mu"] + cp["b_mu"],
                             feats @ cp["w_sig"] + cp["b_sig"]], axis=-1)
            for cp in comp_params]
    return comps, comp_params, feats, raws, k_rep


def jnp_reference(comps, comp_params, feats, raws, k_rep):
    """The unfused per-component path with the identical key tree."""
    keys = jax.random.split(k_rep, len(comps))
    zs, kls, lq, lp = [], [], 0.0, 0.0
    for c, cp, ck, raw in zip(comps, comp_params, keys, raws):
        rep = reparametrize(ck, c, cp, feats, raw=raw)
        zs.append(rep.z)
        kls.append(rep.kl)
        lq = lq + rep.log_q
        lp = lp + rep.log_p
    return jnp.concatenate(zs, -1), lq, lp, jnp.stack(kls, -1)


class TestTailKernel:
    @pytest.mark.parametrize("spec", SPECS)
    def test_matches_jnp_path(self, monkeypatch, spec):
        monkeypatch.setenv("MVAE_FUSED_TAIL", "1")
        comps, comp_params, feats, raws, k_rep = build(spec)
        raw_all = jnp.concatenate(raws, axis=-1)
        z, lq, lp, kl, kvec = tail_kernels.reparam_all(
            k_rep, comps, comp_params, raw_all)
        z_r, lq_r, lp_r, kl_r = jnp_reference(comps, comp_params, feats,
                                              raws, k_rep)
        np.testing.assert_allclose(np.asarray(z), np.asarray(z_r),
                                   rtol=2e-4, atol=5e-5)
        np.testing.assert_allclose(np.asarray(lq), np.asarray(lq_r),
                                   rtol=2e-4, atol=5e-4)
        np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_r),
                                   rtol=2e-4, atol=5e-4)
        np.testing.assert_allclose(np.asarray(kl), np.asarray(kl_r),
                                   rtol=2e-4, atol=5e-4)

    @pytest.mark.parametrize("spec", ["h2,s2,e2", "u6", "d3,s2",
                                      "s6:wrapped"])
    def test_grads_match_jnp_path(self, monkeypatch, spec):
        """d(loss)/d(raw heads) and d(loss)/d(curvature): the in-kernel
        jax.vjp backward against (a) plain AD of the SAME tile math outside
        pallas (tight — isolates the pallas/vjp machinery) and (b) the
        library per-component path (looser on curvature: the two
        formulations agree to 5e-8 in f64 on identical draws, but the f32
        curvature grad is a heavily-cancelling 160-sample sum with ~2%
        rounding scatter between algebraically equal forms)."""
        monkeypatch.setenv("MVAE_FUSED_TAIL", "1")
        comps, comp_params, feats, raws, k_rep = build(spec)
        raw_all = jnp.concatenate(raws, axis=-1)
        keys = jax.random.split(k_rep, len(comps))

        def loss_fused(raw_all, cps):
            z, lq, lp, kl, _ = tail_kernels.reparam_all(
                k_rep, comps, cps, raw_all)
            return (jnp.mean(jnp.sum(z * z, -1)) + jnp.mean(kl)
                    + 0.1 * jnp.mean(lq - lp))

        def loss_ref(raw_all, cps):
            off, zs, kls, lq, lp = 0, [], [], 0.0, 0.0
            for c, cp, ck in zip(comps, cps, keys):
                raw = raw_all[:, off:off + c.head_width]
                off += c.head_width
                rep = reparametrize(ck, c, cp, feats, raw=raw)
                zs.append(rep.z)
                kls.append(rep.kl)
                lq = lq + rep.log_q
                lp = lp + rep.log_p
            z = jnp.concatenate(zs, -1)
            return (jnp.mean(jnp.sum(z * z, -1))
                    + jnp.mean(jnp.stack(kls, -1))
                    + 0.1 * jnp.mean(lq - lp))

        def loss_tile(raw_all, cps):
            z, lq, lp, kl, _ = tail_kernels.reparam_all_jnp(
                k_rep, comps, cps, raw_all)
            return (jnp.mean(jnp.sum(z * z, -1)) + jnp.mean(kl)
                    + 0.1 * jnp.mean(lq - lp))

        g1 = jax.grad(loss_fused, argnums=(0, 1))(raw_all, comp_params)
        gt = jax.grad(loss_tile, argnums=(0, 1))(raw_all, comp_params)
        g2 = jax.grad(loss_ref, argnums=(0, 1))(raw_all, comp_params)
        # (a) pallas + in-kernel vjp == plain AD of the same expressions
        np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(gt[0]),
                                   rtol=1e-3, atol=5e-4)
        # (b) estimator-level agreement with the library path
        np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                                   rtol=5e-3, atol=5e-4)
        for a, t, b in zip(g1[1], gt[1], g2[1]):
            if "c_param" in a:
                np.testing.assert_allclose(np.asarray(a["c_param"]),
                                           np.asarray(t["c_param"]),
                                           rtol=2e-3, atol=5e-4)
                np.testing.assert_allclose(np.asarray(a["c_param"]),
                                           np.asarray(b["c_param"]),
                                           rtol=5e-2, atol=1e-3)

    def test_scalar_sigma_and_wraps0(self, monkeypatch):
        monkeypatch.setenv("MVAE_FUSED_TAIL", "1")
        for kwargs in ({"scalar_sigma": True}, {"wraps": 0}):
            comps, comp_params, feats, raws, k_rep = build("d2,p2", **kwargs)
            raw_all = jnp.concatenate(raws, axis=-1)
            z, lq, lp, kl, _ = tail_kernels.reparam_all(
                k_rep, comps, comp_params, raw_all)
            z_r, lq_r, lp_r, kl_r = jnp_reference(comps, comp_params, feats,
                                                  raws, k_rep)
            np.testing.assert_allclose(np.asarray(kl), np.asarray(kl_r),
                                       rtol=2e-4, atol=5e-4)
            np.testing.assert_allclose(np.asarray(z), np.asarray(z_r),
                                       rtol=2e-4, atol=5e-5)

    def test_unpadded_batch(self, monkeypatch):
        """B not a multiple of 128: sanitized pads, exact slice back."""
        monkeypatch.setenv("MVAE_FUSED_TAIL", "1")
        comps, comp_params, feats, raws, k_rep = build("h2,s2,e2")
        n = 67
        raw_all = jnp.concatenate(raws, axis=-1)
        z_full, lq_full, *_ = tail_kernels.reparam_all(
            k_rep, comps, comp_params, raw_all)
        # same key => same noise; the sliced batch must reproduce rows 0..n
        # only when noise is drawn per full batch — so compare against the
        # jnp reference on the sliced head instead
        comps2 = comps
        raws2 = [r[:n] for r in raws]
        z, lq, lp, kl, _ = tail_kernels.reparam_all(
            k_rep, comps2, comp_params, jnp.concatenate(raws2, axis=-1))
        z_r, lq_r, lp_r, kl_r = jnp_reference(
            comps2, comp_params, feats[:n], raws2, k_rep)
        assert z.shape == z_r.shape
        np.testing.assert_allclose(np.asarray(z), np.asarray(z_r),
                                   rtol=2e-4, atol=5e-5)
        np.testing.assert_allclose(np.asarray(kl), np.asarray(kl_r),
                                   rtol=2e-4, atol=5e-4)

    def test_loss_fn_fused_route_matches(self, monkeypatch):
        """End-to-end: vae.loss_fn value + grads, fused vs jnp routing."""
        from mvae_tpu.models import VAEConfig, init_params, loss_fn
        comps = parse_components("h2,s2,e2", fixed_curvature=False)
        cfg = VAEConfig(components=comps, data_shape=(32,), arch="mlp",
                        h_dim=48)
        params = init_params(jax.random.key(0), cfg)
        x = (jax.random.uniform(jax.random.key(1), (96, 32)) > 0.5).astype(
            F32)
        key = jax.random.key(2)

        monkeypatch.setenv("MVAE_FUSED_TAIL", "1")
        assert vae._fused_tail_eligible(cfg, params)
        (l1, s1), g1 = jax.value_and_grad(
            lambda p: loss_fn(key, cfg, p, x), has_aux=True)(params)
        monkeypatch.setenv("MVAE_FUSED_TAIL", "0")
        assert not vae._fused_tail_eligible(cfg, params)
        (l2, s2), g2 = jax.value_and_grad(
            lambda p: loss_fn(key, cfg, p, x), has_aux=True)(params)
        np.testing.assert_allclose(float(l1), float(l2), rtol=2e-5)
        flat1 = jax.tree.leaves(g1)
        flat2 = jax.tree.leaves(g2)
        for a, b in zip(flat1, flat2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=2e-4)

    def test_vmapped_fused_tail(self, monkeypatch):
        """The IWAE fallback path vmaps forward_from_features over samples;
        pallas_call's batching rule must keep the fused tail usable there."""
        monkeypatch.setenv("MVAE_FUSED_TAIL", "1")
        comps, comp_params, feats, raws, k_rep = build("h2,s2,e2")
        raw_all = jnp.concatenate(raws, axis=-1)
        sks = jax.random.split(k_rep, 3)
        z_v, lq_v, lp_v, kl_v, _ = jax.vmap(
            lambda sk: tail_kernels.reparam_all(sk, comps, comp_params,
                                                raw_all))(sks)
        for i, sk in enumerate(sks):
            z, lq, lp, kl, _ = tail_kernels.reparam_all(
                sk, comps, comp_params, raw_all)
            np.testing.assert_allclose(np.asarray(z_v[i]), np.asarray(z),
                                       rtol=1e-5, atol=1e-6)

    def test_eligibility_gate(self, monkeypatch):
        monkeypatch.setenv("MVAE_FUSED_TAIL", "1")
        from mvae_tpu.models import VAEConfig, init_params
        ok = parse_components("h2,s2,e2")
        cfg = VAEConfig(components=ok, data_shape=(16,), h_dim=8)
        params = init_params(jax.random.key(0), cfg)
        assert vae._fused_tail_eligible(cfg, params)
        # vmf at m != 3 is NOT kernel-capable (wx channel deleted in r5
        # after losing its on-chip A/B at every shape incl. large-B s12)
        s4 = parse_components("s4")
        cfg_s4 = VAEConfig(components=s4, data_shape=(16,), h_dim=8)
        params_s4 = init_params(jax.random.key(0), cfg_s4)
        assert not vae._fused_tail_eligible(cfg_s4, params_s4)
        # riemannian posterior and projected-sphere vmf are jnp-only
        rn = parse_components("h2:riemannian")
        cfg_rn = VAEConfig(components=rn, data_shape=(16,), h_dim=8)
        params_rn = init_params(jax.random.key(0), cfg_rn)
        assert not vae._fused_tail_eligible(cfg_rn, params_rn)
        pv = parse_components("p2:vmf")
        cfg_pv = VAEConfig(components=pv, data_shape=(16,), h_dim=8)
        params_pv = init_params(jax.random.key(0), cfg_pv)
        assert not vae._fused_tail_eligible(cfg_pv, params_pv)

    def test_auto_routing_policy(self, monkeypatch):
        """Measured routing (RESULTS_r4 §8): under auto, kernel-capable
        products where the jnp tail measured faster stay on the jnp path;
        MVAE_FUSED_TAIL=1 forces them fused."""
        from mvae_tpu.models import VAEConfig, init_params

        def eligible(spec):
            comps = parse_components(spec)
            cfg = VAEConfig(components=comps, data_shape=(16,), h_dim=8)
            params = init_params(jax.random.key(0), cfg)
            return vae._fused_tail_eligible(cfg, params)

        monkeypatch.setenv("MVAE_FUSED_TAIL", "auto")
        monkeypatch.setattr(tail_kernels.jax, "default_backend",
                            lambda: "tpu")  # auto gate is backend-aware
        # fused-wins family
        for spec in ("h2,s2,e2", "2h2", "3s2", "u6", "p6"):
            assert eligible(spec), spec
            assert tail_kernels.product_fused_default(
                parse_components(spec)), spec
        # jnp-wins family (capable, auto-routed away)
        for spec in ("e6", "h6", "d6"):
            assert not eligible(spec), spec
        # m != 3 vMF: not capable at all since the r5 wx-channel deletion
        for spec in ("s6", "s4,h2,e2"):
            assert not eligible(spec), spec
        # force-fused override applies to capable products only
        monkeypatch.setenv("MVAE_FUSED_TAIL", "1")
        for spec in ("e6", "h6", "d6"):
            assert eligible(spec), spec
        for spec in ("s6", "s4,h2,e2"):
            assert not eligible(spec), spec

    def test_auto_routing_reason_in_report(self, monkeypatch):
        from mvae_tpu.models import VAEConfig, init_params
        monkeypatch.setenv("MVAE_FUSED_TAIL", "auto")
        monkeypatch.setattr(tail_kernels.jax, "default_backend",
                            lambda: "tpu")
        comps = parse_components("h6")
        cfg = VAEConfig(components=comps, data_shape=(16,), h_dim=8)
        params = init_params(jax.random.key(0), cfg)
        rep = vae.fused_path_report(cfg, params)["train_tail"]
        assert not rep["active"]
        assert "jnp tail measured faster" in rep["why"]
        # m != 3 vMF reports capability, not policy
        comps_s6 = parse_components("s6")
        cfg_s6 = VAEConfig(components=comps_s6, data_shape=(16,), h_dim=8)
        params_s6 = init_params(jax.random.key(0), cfg_s6)
        rep_s6 = vae.fused_path_report(cfg_s6, params_s6)["train_tail"]
        assert not rep_s6["active"]
        assert "unsupported component" in rep_s6["why"]
