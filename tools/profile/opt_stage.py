"""Isolate the optimizer-stage cost inside the train step.

train_breakdown.py showed ~24.7 ms of the 59.5 ms x-416-b16 step is
spent AFTER value_and_grad (sgd_apply + EMA + metrics pack) — ~10x off
the HBM floor for its ~2.5 GB of traffic. This times each piece alone,
chained-K on device, plus flat-buffer variants, to find the structure:
per-leaf kernel overhead (~800 leaves x several ops) vs something else.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main(scale: str = "x", ts: int = 416):
    import jax
    import jax.numpy as jnp

    from oriented_object_detection_tpu.utils.runtime import (
        enable_compilation_cache)

    enable_compilation_cache()

    from oriented_object_detection_tpu.config import TrainConfig
    from oriented_object_detection_tpu.train import trainer as TR

    cfg = TrainConfig(tile_size=ts, model_scale=scale, channels=3)
    model, state, _ = TR.create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=100)
    params, mu, ema = state.params, state.opt_state, state.ema_params
    grads = jax.tree.map(lambda x: x * 0 + 1e-4, params)
    grads = jax.tree.map(jnp.asarray, grads)
    mask = TR.decay_mask(params)
    labels = TR.bias_labels(params)
    hypers = {"momentum": jnp.float32(0.937), "lr": jnp.float32(3e-3),
              "lr_bias": jnp.float32(3e-3)}

    n_leaves = len(jax.tree.leaves(params))
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"{n_leaves} leaves, {n_params/1e6:.1f}M params")

    def _t(fn):
        t0 = time.time()
        fn()
        return time.time() - t0

    def chain_ms(make_step, K=8):
        """make_step(x_tree) -> x_tree-like; chained via the tree itself."""
        def chained(p, g, m, e):
            for _ in range(K):
                p, m, e = make_step(p, g, m, e)
            return jax.tree.leaves(p)[0].astype(jnp.float32).sum()
        f1 = jax.jit(lambda p, g, m, e: jax.tree.leaves(
            make_step(p, g, m, e)[0])[0].astype(jnp.float32).sum())
        fK = jax.jit(chained)
        np.asarray(f1(params, grads, mu, ema))
        np.asarray(fK(params, grads, mu, ema))
        t1 = np.median([_t(lambda: np.asarray(f1(params, grads, mu, ema)))
                        for _ in range(3)])
        tK = np.median([_t(lambda: np.asarray(fK(params, grads, mu, ema)))
                        for _ in range(3)])
        return (tK - t1) / (K - 1) * 1000.0

    # A) production per-leaf sgd_apply + EMA
    def step_tree(p, g, m, e):
        np_, nm = TR.sgd_apply(p, g, m, hypers, 1e-3, mask, labels)
        ne = jax.tree.map(lambda a, b: 0.999 * a + 0.001 * b, e, np_)
        return np_, nm, ne

    print(f"per-leaf sgd+ema: {chain_ms(step_tree):.1f} ms")

    # B) flat-buffer variant: one concat per tree, scalar-group math.
    # Group leaves by (decayed, bias) so hyperparams stay scalars.
    leaves_p, treedef = jax.tree.flatten(params)
    leaves_mask = jax.tree.leaves(mask)
    leaves_lab = jax.tree.leaves(labels)
    sizes = [x.size for x in leaves_p]
    shapes = [x.shape for x in leaves_p]
    groups = {}
    for i, (dk, lb) in enumerate(zip(leaves_mask, leaves_lab)):
        groups.setdefault((bool(dk), str(lb)), []).append(i)

    def flatcat(leaves, idxs):
        return jnp.concatenate([leaves[i].reshape(-1) for i in idxs])

    def step_flat(p, g, m, e):
        lp, lg, lm, le = (jax.tree.leaves(t) for t in (p, g, m, e))
        outp, outm, oute = list(lp), list(lm), list(le)
        for (decayed, label), idxs in groups.items():
            fp = flatcat(lp, idxs)
            fg = flatcat(lg, idxs)
            fm = flatcat(lm, idxs)
            fe = flatcat(le, idxs)
            if decayed:
                fg = fg + 1e-3 * fp
            fm_new = fg + hypers["momentum"] * fm
            u = fg + hypers["momentum"] * fm_new
            lr = hypers["lr_bias"] if label == "bias" else hypers["lr"]
            fp_new = fp - lr * u
            fe_new = 0.999 * fe + 0.001 * fp_new
            off = 0
            for i in idxs:
                outp[i] = jax.lax.dynamic_slice_in_dim(
                    fp_new, off, sizes[i]).reshape(shapes[i])
                outm[i] = jax.lax.dynamic_slice_in_dim(
                    fm_new, off, sizes[i]).reshape(shapes[i])
                oute[i] = jax.lax.dynamic_slice_in_dim(
                    fe_new, off, sizes[i]).reshape(shapes[i])
                off += sizes[i]
        un = lambda ls: jax.tree.unflatten(treedef, ls)
        return un(outp), un(outm), un(oute)

    print(f"flat-group sgd+ema: {chain_ms(step_flat):.1f} ms "
          f"({len(groups)} groups)")


if __name__ == "__main__":
    main()
