import sys, time, jax, jax.numpy as jnp, optax
from functools import partial
from mvae_tpu.components import parse_components
from mvae_tpu.models.vae import VAEConfig, init_params, loss_fn

spec = sys.argv[1]
opt = optax.adam(1e-3)
N = 6000
x = (jax.random.uniform(jax.random.key(1), (1024, 784)) > 0.5).astype(jnp.float32)

def measure(allow_fused):
    comps = parse_components(spec, fixed_curvature=False)
    cfg = VAEConfig(components=comps, data_shape=(784,), h_dim=400)
    params = init_params(jax.random.key(0), cfg)
    def step(carry, i):
        p, o = carry
        key = jax.random.fold_in(jax.random.key(3), i)
        (l, _), g = jax.value_and_grad(
            lambda p: loss_fn(key, cfg, p, x, allow_fused=allow_fused),
            has_aux=True)(p)
        u, o = opt.update(g, o, p)
        return (optax.apply_updates(p, u), o), l
    @partial(jax.jit, static_argnums=2)
    def run(p, o, n):
        (p, o), ls = jax.lax.scan(step, (p, o), jnp.arange(n))
        return p, o, ls[-1]
    o0 = opt.init(params)
    p, o, l = run(params, o0, N); float(l)
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        p, o, l = run(params, o0, N); float(l)
        best = min(best, time.perf_counter() - t0)
    return N / best

f = measure(True)
j = measure(False)
print(f"{spec:10s}: fused {f:8,.0f} steps/s   jnp {j:8,.0f} steps/s   ratio {f/j:.3f}")

# Routing-policy probe behind kernels/tail_kernels.product_fused_default
# (RESULTS_r4 §8): run as `python scripts/probe_tail_routing.py <spec>`
# on the TPU box; the "fused" column follows the production auto routing,
# so a policy-excluded spec prints ratio ~1.0.
