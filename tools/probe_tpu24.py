"""hi/lo split path on TPU: 1000-state model, correctness + throughput."""
import json, sys, time
sys.setrecursionlimit(100_000)
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax, jax.numpy as jnp, numpy as np

def report(name, **kw): print(json.dumps({"probe": name, **kw}), flush=True)
def fail(name, e): report(name, error=f"{type(e).__name__}: {str(e)[:250]}")
def fetch(x): return np.asarray(jax.tree.leaves(x)[0].ravel()[:1])

def main():
    report("device", kind=jax.devices()[0].device_kind)
    rng = np.random.default_rng(42)
    from halo2_regex_tpu.models.compiled import CompiledRegexModel
    from halo2_regex_tpu.models.defs import AllstrRegexDef, RegexDefs
    from halo2_regex_tpu.ops import reference as ref_ops
    from halo2_regex_tpu.ops.pallas_scan import PallasMatcher
    from halo2_regex_tpu.ops.scan_jax import pack_batch
    S, L, B = 1000, 4096, 256
    allstr = AllstrRegexDef(first_state_val=0, accepted_state_val=7,
                            largest_state_val=S - 1)
    line = 3
    for c in range(97, 123):
        for s in range(S):
            allstr.state_lookup[(c, s)] = (line, int(rng.integers(0, S)))
            line += 1
    model = CompiledRegexModel.from_defs(
        [RegexDefs(allstr=allstr, substrs=[])], max_chars_size=L)
    try:
        m = PallasMatcher(model, max_pairs=4096)
        report("hi_lo_config", tb=m.batch_tile, mode=m.mode, hi_lo=m.hi_lo)
        strings = [bytes(rng.integers(97, 123, size=int(rng.integers(0, L))
                                      ).astype(np.uint8)) for _ in range(4)]
        strings += [b""] * (B - 4)
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
        report("hi_lo_correct", ok=ok, bad=bad)
        cj = jnp.asarray(rng.integers(97, 123, size=(B, L)).astype(np.uint8))
        lj = jnp.asarray(np.full((B,), L, np.int32))
        def make(K):
            @jax.jit
            def f(c):
                out = None
                for _ in range(K):
                    out = m._run(c, lj)["mask"]
                    dep = (out[0, 0] & 1).astype(jnp.uint8)
                    c = c ^ dep
                return out
            return f
        f1, f3 = make(1), make(3)
        for f in (f1, f3): fetch(f(cj))
        def t(f, n=3):
            t0 = time.perf_counter()
            for _ in range(n): fetch(f(cj))
            return (time.perf_counter() - t0) / n
        per = (t(f3) - t(f1)) / 2
        report("hi_lo_tput", per_iter_sec=per, mbytes_per_sec=B*L/per/1e6)
    except Exception as e:
        fail("hi_lo", e)

if __name__ == "__main__":
    main()
