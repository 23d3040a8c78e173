"""Split-mode on TPU: correctness + chained throughput."""
import json, sys, time
sys.setrecursionlimit(100_000)
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax, jax.numpy as jnp, numpy as np

def report(name, **kw): print(json.dumps({"probe": name, **kw}), flush=True)
def fail(name, e): report(name, error=f"{type(e).__name__}: {str(e)[:300]}")
def fetch(x): return np.asarray(jax.tree.leaves(x)[0].ravel()[:1])

def main():
    report("device", kind=jax.devices()[0].device_kind)
    rng = np.random.default_rng(0)
    from halo2_regex_tpu.models import zoo
    from halo2_regex_tpu.ops import reference as ref_ops
    from halo2_regex_tpu.ops.pallas_scan import PallasMatcher
    from halo2_regex_tpu.ops.scan_jax import pack_batch
    B, L = 4096, 1024
    model = zoo.email_headers_model(max_chars_size=L, headers=("from",))

    # correctness at L=1024 with real content
    try:
        m = PallasMatcher(model)
        assert m.mode == "split", m.mode
        strings = [
            b"from:alice@gmail.com\r\n",
            b"x" * 700 + b"\r\nfrom:bob.smith@sub.domain-x.org\r\n",
            b"", b"y" * L,
        ] * 128
        chars, lengths = pack_batch(strings, L)
        res = m(chars, lengths)
        ok, bad = True, None
        for i in range(4):
            oracle = ref_ops.match_substrs(model.regex_defs, strings[i], L)
            row = res.map(lambda a: np.asarray(a)[i])
            for n in row.field_names():
                if not (np.asarray(getattr(row, n)).astype(np.int64)
                        == np.asarray(getattr(oracle, n)).astype(np.int64)).all():
                    ok, bad = False, (i, n); break
            if not ok: break
        report("split_correct_L1024", ok=ok, bad=bad, tb=m.batch_tile)
    except Exception as e:
        fail("split_correct_L1024", e)

    # chained throughput
    try:
        chars_r = jnp.asarray(rng.integers(32, 127, size=(B, L)).astype(np.uint8))
        lengths_r = jnp.asarray(np.full((B,), L, np.int32))
        def make(K):
            @jax.jit
            def f(c):
                out = None
                for _ in range(K):
                    out = m._run(c, lengths_r)["mask"]
                    dep = (out[0, 0] & 1).astype(jnp.uint8)
                    c = c ^ dep
                return out
            return f
        f1, f5 = make(1), make(5)
        for f in (f1, f5): fetch(f(chars_r))
        def t(f, n=4):
            t0 = time.perf_counter()
            for _ in range(n): fetch(f(chars_r))
            return (time.perf_counter() - t0) / n
        per = (t(f5) - t(f1)) / 4
        report("split_tput", per_iter_sec=per, mbytes_per_sec=B*L/per/1e6)
    except Exception as e:
        fail("split_tput", e)

if __name__ == "__main__":
    main()
