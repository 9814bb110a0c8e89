"""L5/L6/L7 tests: dataset invariants, epoch-scan training decreases loss,
curvature burn-in freeze semantics, checkpoint resume, CLI smoke."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvae_tpu.components import parse_components
from mvae_tpu.data import ArrayDataset, binarize_batch, generate_bdp
from mvae_tpu.models import VAEConfig
from mvae_tpu.train import TrainConfig, Trainer


def tiny_dataset(n=256, d=20, seed=0):
    rng = np.random.default_rng(seed)
    protos = rng.random((4, d)).astype(np.float32)
    train = protos[rng.integers(0, 4, n)]
    test = protos[rng.integers(0, 4, max(n // 4, 64))]
    return ArrayDataset("tiny", train, test, (d,), binarize=True)


def make_trainer(tmp_path, spec="h2,e2", fixed=True, epochs=3, burnin=1,
                 **tc_kw):
    ds = tiny_dataset()
    cfg = VAEConfig(components=parse_components(spec, fixed_curvature=fixed),
                    data_shape=ds.data_shape, arch="mlp", h_dim=32)
    tc = TrainConfig(epochs=epochs, batch_size=64, burnin_epochs=burnin,
                     likelihood_n=20, likelihood_chunk=10, lr=5e-3,
                     eval_batch_size=64, **tc_kw)
    return Trainer(cfg, ds, tc, run_dir=str(tmp_path / "run"))


class TestData:
    def test_binarize(self):
        x = jnp.asarray([[0.0, 1.0, 0.5]])
        out = binarize_batch(jax.random.key(0), x, True)
        assert set(np.unique(np.asarray(out))) <= {0.0, 1.0}
        np.testing.assert_allclose(
            np.asarray(binarize_batch(jax.random.key(0), x, False)), x)

    def test_bdp_deterministic(self):
        a, b = generate_bdp(dim=16, depth=5), generate_bdp(dim=16, depth=5)
        np.testing.assert_array_equal(a.train, b.train)
        assert set(np.unique(a.train)) <= {0.0, 1.0}

    def test_epoch_batches_shapes(self):
        ds = tiny_dataset()
        batches = list(ds.epoch_batches(0, 100))
        assert all(b.shape == (100, 20) for b in batches)
        # different epochs shuffle differently
        b0 = next(ds.epoch_batches(0, 100))
        b1 = next(ds.epoch_batches(1, 100))
        assert not np.array_equal(b0, b1)


class TestTrainer:
    def test_loss_decreases(self, tmp_path):
        tr = make_trainer(tmp_path, epochs=5)
        first = tr.train_one_epoch(0)
        for e in range(1, 5):
            last = tr.train_one_epoch(e)
        assert last["elbo"] > first["elbo"] + 0.5

    def test_eval_and_ll(self, tmp_path):
        tr = make_trainer(tmp_path, epochs=1)
        tr.train_one_epoch(0)
        stats = tr.evaluate_elbo()
        assert np.isfinite(stats["elbo"])
        ll = tr.evaluate_log_likelihood()
        assert np.isfinite(ll)
        assert ll >= stats["elbo"] - 0.5  # IWAE at least as tight

    def test_curvature_frozen_during_burnin(self, tmp_path):
        tr = make_trainer(tmp_path, spec="h2,s2", fixed=False, epochs=3,
                          burnin=2)
        k0 = [float(c.curvature(p)) for c, p in
              zip(tr.model_cfg.components, tr.params["components"])]
        tr.train_one_epoch(0)  # burn-in: frozen
        k1 = [float(c.curvature(p)) for c, p in
              zip(tr.model_cfg.components, tr.params["components"])]
        np.testing.assert_allclose(k1, k0, rtol=1e-12)
        tr.train_one_epoch(1)  # still burn-in
        tr.train_one_epoch(2)  # unfrozen now
        k3 = [float(c.curvature(p)) for c, p in
              zip(tr.model_cfg.components, tr.params["components"])]
        assert any(abs(a - b) > 1e-6 for a, b in zip(k3, k0))

    def test_fixed_curvature_never_moves(self, tmp_path):
        tr = make_trainer(tmp_path, spec="h2", fixed=True, epochs=3,
                          burnin=0)
        k0 = float(tr.model_cfg.components[0].curvature(
            tr.params["components"][0]))
        for e in range(3):
            tr.train_one_epoch(e)
        k1 = float(tr.model_cfg.components[0].curvature(
            tr.params["components"][0]))
        assert k0 == k1

    def test_eval_elbo_includes_tail(self, tmp_path):
        """Regression (VERDICT r1 weak #4): evaluate_elbo must not drop the
        tail batch. Test split 100 with eval_batch_size 64 -> 36-example
        padded tail; perturbing ONLY the tail must change the result."""
        rng = np.random.default_rng(3)
        train = rng.random((128, 20)).astype(np.float32)
        test = rng.random((100, 20)).astype(np.float32)
        ds = ArrayDataset("tiny", train, test, (20,), binarize=False)
        cfg = VAEConfig(components=parse_components("e2"),
                        data_shape=(20,), arch="mlp", h_dim=16)
        tc = TrainConfig(epochs=1, batch_size=64, eval_batch_size=64,
                         burnin_epochs=0)
        tr = Trainer(cfg, ds, tc, run_dir=str(tmp_path / "run"))

        key0 = tr.key
        s1 = tr.evaluate_elbo()
        tr.key = key0
        s1b = tr.evaluate_elbo()
        assert s1["elbo"] == s1b["elbo"]  # deterministic given the key
        # flip the tail only (rows 64:100)
        tr._test_data = tr._test_data.at[64:].set(
            1.0 - tr._test_data[64:])
        tr.key = key0
        s2 = tr.evaluate_elbo()
        assert abs(s1["elbo"] - s2["elbo"]) > 1e-4

    def test_ll_repeats_averaging(self, tmp_path):
        """repeats>1 averages independent eval passes and logs the std —
        needed because a single dynamically-binarized IWAE pass has
        ~0.1-nat noise on MNIST-size splits."""
        import json as _json
        tr = make_trainer(tmp_path, epochs=1)
        tr.train_one_epoch(0)
        ll = tr.evaluate_log_likelihood(repeats=3)
        assert np.isfinite(ll)
        recs = [_json.loads(l) for l in
                open(tmp_path / "run" / "metrics.jsonl")]
        rep_rec = [r for r in recs if "test/log_likelihood_iwae_std" in r]
        assert rep_rec and len(
            rep_rec[-1]["test/log_likelihood_iwae_repeats"]) == 3
        assert abs(np.mean(rep_rec[-1]["test/log_likelihood_iwae_repeats"])
                   - ll) < 1e-6

    def test_fixed_eval_binarization_keys(self, tmp_path):
        """eval_binarize='fixed': the binarization key is a pure function
        of (seed, batch index) — identical across passes — while the model
        key keeps advancing (fresh IWAE draws)."""
        tr = make_trainer(tmp_path, epochs=1, eval_binarize="fixed")
        kb1, km1 = tr._eval_keys(3, 8)
        kb2, km2 = tr._eval_keys(3, 8)
        assert jax.random.key_data(kb1).tolist() == \
            jax.random.key_data(kb2).tolist()
        assert jax.random.key_data(km1).tolist() != \
            jax.random.key_data(km2).tolist()
        assert np.isfinite(tr.evaluate_log_likelihood())
        # dynamic mode: binarization key changes too
        tr2 = make_trainer(tmp_path / "dyn", epochs=1)
        kb1, _ = tr2._eval_keys(3, 8)
        kb2, _ = tr2._eval_keys(3, 8)
        assert jax.random.key_data(kb1).tolist() != \
            jax.random.key_data(kb2).tolist()

    def test_fixed_binarization_invariant_to_eval_batch_size(self, tmp_path):
        """The pinned test set must be a pure function of (seed, example
        index): two different eval batch sizes produce the SAME binarized
        examples (round-2 VERDICT weak #6 — the batch-index keying silently
        re-binarized the split when eval_batch_size changed)."""
        from mvae_tpu.data.base import binarize_rows
        tr = make_trainer(tmp_path, epochs=1, eval_binarize="fixed")
        data = tr._test_data
        out = {}
        for bs in (16, 64):
            batches, _, n = tr._split_batches(data, bs)
            k_bins, _ = tr._eval_keys(batches.shape[0], bs)
            xb = jax.vmap(lambda kb, b: binarize_rows(kb, b, True))(
                k_bins, batches)
            out[bs] = np.asarray(xb).reshape(-1, data.shape[-1])[:n]
        np.testing.assert_array_equal(out[16], out[64])

    def test_checkpoint_resume(self, tmp_path):
        tr = make_trainer(tmp_path, epochs=2)
        tr.train_one_epoch(0)
        tr.save_checkpoint()
        step0 = int(tr.step)
        params0 = jax.tree.map(np.asarray, tr.params)

        tr2 = make_trainer(tmp_path, epochs=2)
        tr2.restore_checkpoint()
        assert int(tr2.step) == step0
        for a, b in zip(jax.tree.leaves(params0),
                        jax.tree.leaves(jax.tree.map(np.asarray, tr2.params))):
            np.testing.assert_array_equal(a, b)

    def test_metrics_jsonl_written(self, tmp_path):
        tr = make_trainer(tmp_path, epochs=1)
        tr.fit(verbose=False)
        metrics = (tmp_path / "run" / "metrics.jsonl").read_text().strip()
        assert len(metrics.splitlines()) >= 2


class TestNonFiniteGuard:
    def test_halts_and_checkpoints_on_nan(self, tmp_path):
        """VERDICT r3 #2: a NaN mid-training must HALT the run at the next
        epoch boundary (never 70 more epochs of NaN arithmetic), dump a
        FAILED_NONFINITE record, and write a checkpoint."""
        import json as _json
        from mvae_tpu.train.trainer import NonFiniteError
        tr = make_trainer(tmp_path, epochs=5)
        tr.train_one_epoch(0)  # healthy epoch first
        # poison one weight: every subsequent loss/stat is NaN
        enc = tr.params["encoder"]
        leaf = jax.tree.leaves(enc)[0]
        poisoned = leaf.at[(0,) * leaf.ndim].set(jnp.nan)
        tr.params["encoder"] = jax.tree.map(
            lambda a: poisoned if a is leaf else a, enc,
            is_leaf=lambda a: a is leaf)
        with pytest.raises(NonFiniteError) as exc_info:
            tr.fit(verbose=False)
        assert exc_info.value.epoch == 0
        recs = [_json.loads(l) for l in
                open(tmp_path / "run" / "metrics.jsonl")]
        fail = [r for r in recs if r.get("status") == "FAILED_NONFINITE"]
        assert fail and fail[-1]["nonfinite_epoch"] == 0
        assert (tmp_path / "run" / "ckpt").exists()

    def test_finite_run_unaffected(self, tmp_path):
        tr = make_trainer(tmp_path, epochs=2)
        result = tr.fit(verbose=False)
        assert np.isfinite(result["test/log_likelihood_iwae"])


class TestFusedPathsReport:
    def test_report_matches_traced_program(self, tmp_path, monkeypatch):
        """VERDICT r3 #7: the fused_paths gate report must match the traced
        program — when it claims the tail kernel is active, the loss jaxpr
        contains a pallas_call, and vice versa."""
        from mvae_tpu.models import vae

        def tail_in_jaxpr(tr):
            jaxpr = jax.make_jaxpr(
                lambda p: vae.loss_fn(jax.random.key(0), tr.model_cfg, p,
                                      tr._train_data[:8])[0])(tr.params)
            return "pallas_call" in str(jaxpr)

        # CPU default: tail kernel off (env gate)
        tr = make_trainer(tmp_path / "off", spec="h2,e2", epochs=1)
        rep = tr.fused_paths
        assert not rep["train_tail"]["active"]
        assert not tail_in_jaxpr(tr)

        # opt-in (interpret mode on CPU): supported product -> active
        monkeypatch.setenv("MVAE_FUSED_TAIL", "1")
        tr_on = make_trainer(tmp_path / "on", spec="h2,e2", epochs=1)
        assert tr_on.fused_paths["train_tail"]["active"]
        assert tail_in_jaxpr(tr_on)

        # embedded-sphere wrapped is IN the kernel family since r4's
        # snapshot commit (tail_kernels.component_supported covers
        # wrapped-on-s): forced-fused it must be active, report == jaxpr
        tr_s = make_trainer(tmp_path / "s", spec="s2:wrapped,e2", epochs=1)
        assert tr_s.fused_paths["train_tail"]["active"]
        assert tail_in_jaxpr(tr_s)

        # genuinely unsupported component (riemannian posterior): falls
        # back + says why, even though MVAE_FUSED_TAIL=1 is still set
        tr_r = make_trainer(tmp_path / "r", spec="d2:riemannian,e2",
                            epochs=1)
        repo = tr_r.fused_paths["train_tail"]
        assert not repo["active"] and "d2:riemannian" in repo["why"]
        assert not tail_in_jaxpr(tr_r)

        # auto routing (env unset): a lone-e product is kernel-CAPABLE but
        # the measured policy keeps it on the jnp tail; report == jaxpr
        monkeypatch.delenv("MVAE_FUSED_TAIL")
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        tr_e = make_trainer(tmp_path / "e", spec="e2", epochs=1)
        repe = tr_e.fused_paths["train_tail"]
        assert not repe["active"] and "measured faster" in repe["why"]

    def test_report_in_cli_result(self, tmp_path):
        from mvae_tpu.cli import main
        import json as _json
        run_dir = str(tmp_path / "fp_run")
        main(["--dataset", "bdp", "--model", "e2", "--epochs", "1",
              "--batch_size", "32", "--h_dim", "16", "--likelihood_n", "20",
              "--run_dir", run_dir])
        summary = _json.loads((tmp_path / "fp_run" / "result.json")
                              .read_text())
        assert {"train_tail", "train_decoder", "iwae_decoder",
                "iwae_reparam", "routing_policy"} <= set(
                    summary["fused_paths"])
        from mvae_tpu.kernels import tail_kernels
        assert (summary["fused_paths"]["routing_policy"]
                == tail_kernels.ROUTING_POLICY)
        # train-only throughput rides next to the whole-run number
        # (VERDICT r4 #7: eval wall must not pollute steps_per_sec rows)
        assert summary["train_wall_seconds"] < summary["wall_seconds"]
        assert (summary["train_steps_per_sec"]
                > summary["steps_per_sec"])


class TestMeshTrainer:
    @pytest.mark.slow
    def test_mesh_training_matches_loss_decrease(self, tmp_path):
        """Full Trainer over a (2,2) mesh on the virtual CPU devices: DP+TP
        sharded epochs train and improve the ELBO."""
        tr = make_trainer(tmp_path, spec="h2,s2,e2", epochs=3,
                          mesh_shape=(2, 2))
        assert tr.mesh is not None and tr.mesh.shape == {"data": 2,
                                                         "model": 2}
        first = tr.train_one_epoch(0)
        for e in range(1, 3):
            last = tr.train_one_epoch(e)
        assert last["elbo"] > first["elbo"] + 0.3
        stats = tr.evaluate_elbo()
        assert np.isfinite(stats["elbo"])

    def test_mesh_matches_single_device_start(self, tmp_path):
        """First-epoch stats on the mesh equal the single-device run to f32
        tolerance (same seed, same math, different layout)."""
        tr_a = make_trainer(tmp_path / "a", spec="h2,e2", epochs=1)
        tr_b = make_trainer(tmp_path / "b", spec="h2,e2", epochs=1,
                            mesh_shape=(4, 2))
        sa = tr_a.train_one_epoch(0)
        sb = tr_b.train_one_epoch(0)
        np.testing.assert_allclose(sa["elbo"], sb["elbo"], rtol=2e-4)


class TestCli:
    def test_cli_bdp_smoke(self, tmp_path, capsys):
        from mvae_tpu.cli import main
        result = main([
            "--dataset", "bdp", "--model", "e2", "--epochs", "1",
            "--batch_size", "32", "--h_dim", "16", "--likelihood_n", "20",
            "--run_dir", str(tmp_path / "cli_run"),
        ])
        assert np.isfinite(result["test/log_likelihood_iwae"])
        assert (tmp_path / "cli_run" / "result.json").exists()

    def test_cli_sigma_cap_flag(self):
        """--sigma_cap False must reach every parsed component (the
        round-5 basin study's uncapped reference-family head)."""
        from mvae_tpu.cli import build_parser
        from mvae_tpu.components import parse_components
        args = build_parser().parse_args(
            ["--model", "s6:wrapped", "--sigma_cap", "False"])
        assert args.sigma_cap is False
        comps = parse_components(args.model, sigma_cap=args.sigma_cap)
        assert all(not c.sigma_cap for c in comps)
        assert all(c.sigma_cap
                   for c in parse_components("s6:wrapped"))  # default on

    def test_cli_eval_only(self, tmp_path):
        from mvae_tpu.cli import main
        run_dir = str(tmp_path / "eo_run")
        main(["--dataset", "bdp", "--model", "e2", "--epochs", "1",
              "--batch_size", "32", "--h_dim", "16", "--likelihood_n", "20",
              "--run_dir", run_dir])
        result = main(["--dataset", "bdp", "--model", "e2",
                       "--batch_size", "32", "--h_dim", "16",
                       "--likelihood_n", "20", "--eval_only",
                       "--ll_max_examples", "64", "--run_dir", run_dir])
        assert result["eval_only"] and result["step"] > 0
        assert np.isfinite(result["test/log_likelihood_iwae"])

    def test_cli_resume(self, tmp_path):
        """--resume restores step/params and continues training."""
        from mvae_tpu.cli import main
        run_dir = str(tmp_path / "res_run")
        base = ["--dataset", "bdp", "--model", "e2", "--batch_size", "32",
                "--h_dim", "16", "--likelihood_n", "20", "--run_dir", run_dir]
        import json as _json

        def last_step():
            return max(_json.loads(l)["step"]
                       for l in open(f"{run_dir}/metrics.jsonl"))

        main(base + ["--epochs", "1"])
        step1 = last_step()
        assert step1 > 0
        r2 = main(base + ["--epochs", "1", "--resume"])
        assert last_step() == 2 * step1  # continued, not restarted
        assert np.isfinite(r2["test/log_likelihood_iwae"])

    def test_cli_generate(self, tmp_path):
        from mvae_tpu.cli import main
        run_dir = str(tmp_path / "gen_run")
        main(["--dataset", "bdp", "--model", "e2", "--epochs", "1",
              "--batch_size", "32", "--h_dim", "16", "--likelihood_n", "20",
              "--generate", "8", "--run_dir", run_dir])
        with np.load(f"{run_dir}/samples.npz") as d:
            assert d["generated"].shape[0] == 8
            assert d["reconstructions"].shape == d["originals"].shape
            assert np.all((d["generated"] >= 0) & (d["generated"] <= 1))

    def test_cli_bad_spec(self):
        from mvae_tpu.cli import main
        with pytest.raises(ValueError):
            main(["--dataset", "bdp", "--model", "zz9", "--epochs", "1"])
