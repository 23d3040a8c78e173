"""TPU probe 16: VPU-accumulate vs MXU compute; 3-header fused model."""
import json, sys, time
sys.setrecursionlimit(100_000)
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax, jax.numpy as jnp, numpy as np

def report(name, **kw): print(json.dumps({"probe": name, **kw}), flush=True)
def fail(name, e): report(name, error=f"{type(e).__name__}: {str(e)[:200]}")
def fetch(x): return np.asarray(jax.tree.leaves(x)[0].ravel()[:1])

def chained_time(m, chars, lengths):
    def make(K):
        @jax.jit
        def f(c):
            out = None
            for _ in range(K):
                out = m._run(c, lengths)["mask"]
                dep = (out[0, 0] & 1).astype(jnp.uint8)
                c = c ^ dep
            return out
        return f
    f1, f5 = make(1), make(5)
    for f in (f1, f5): fetch(f(chars))
    def t(f, n=4):
        t0 = time.perf_counter()
        for _ in range(n): fetch(f(chars))
        return (time.perf_counter() - t0) / n
    return (t(f5) - t(f1)) / 4

def main():
    report("device", kind=jax.devices()[0].device_kind)
    rng = np.random.default_rng(0)
    from halo2_regex_tpu.models import zoo
    from halo2_regex_tpu.ops.pallas_scan import PallasMatcher
    B, L = 4096, 1024
    chars = jnp.asarray(rng.integers(32, 127, size=(B, L)).astype(np.uint8))
    lengths = jnp.asarray(np.full((B,), L, np.int32))

    model1 = zoo.email_headers_model(max_chars_size=L, headers=("from",))
    try:
        m = PallasMatcher(model1, batch_tile=512, slab=8, compute="vpu")
        per = chained_time(m, chars, lengths)
        report("vpu_slab8_tb512", per_iter_sec=per, mbytes_per_sec=B*L/per/1e6)
    except Exception as e:
        fail("vpu_slab8_tb512", e)

    model3 = zoo.email_headers_model(max_chars_size=L, headers=("from","to","subject"))
    try:
        m = PallasMatcher(model3, batch_tile=512, slab=8)
        assert m.fuse_defs
        per = chained_time(m, chars, lengths)
        report("fused3_mxu_slab8_tb512", per_iter_sec=per,
               mbytes_per_sec=B*L/per/1e6, note="3 defs in one pass")
    except Exception as e:
        fail("fused3_mxu_slab8_tb512", e)

if __name__ == "__main__":
    main()
