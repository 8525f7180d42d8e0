"""Decompose decode_and_nms at voxelnet geometry (7 tasks, 180x180)."""
import dataclasses, os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from _timing import chain_ms, enable_compilation_cache
    enable_compilation_cache()
    from futuredet_tpu.config import get_config
    from futuredet_tpu.eval.decode import (decode_and_nms, decode_single,
                                           expand_pseudo_tasks)
    from futuredet_tpu.ops.nms import _greedy_alive, rotate_nms
    from futuredet_tpu.ops.rotated_iou import pairwise_iou_bev

    cfg = get_config("forecast_n3dtf")
    H = W = 180
    T = 7
    rng = np.random.default_rng(0)
    preds = []
    for t in range(T):
        preds.append({
            "hm": jnp.asarray(rng.normal(-2, 1, (1, H, W, 1)).astype(np.float32)),
            "reg": jnp.asarray(rng.normal(0, .2, (1, H, W, 2)).astype(np.float32)),
            "height": jnp.asarray(rng.normal(0, 1, (1, H, W, 1)).astype(np.float32)),
            "dim": jnp.asarray(rng.normal(0, .3, (1, H, W, 3)).astype(np.float32)),
            "rot": jnp.asarray(rng.normal(0, 1, (1, H, W, 2)).astype(np.float32)),
            "vel": jnp.asarray(rng.normal(0, 2, (1, H, W, 2)).astype(np.float32)),
        })
    t_full = chain_ms(lambda x: decode_and_nms(
        cfg, [{k: v + x * 1e-12 for k, v in pd.items()} for pd in preds]
        ).scores, jnp.float32(0.0), iters=50)

    t_dec = chain_ms(lambda x: sum(
        jnp.sum(decode_single({k: v + x * 1e-12 for k, v in pd.items()},
                              cfg)[0]) for pd in preds),
        jnp.float32(0.0), iters=50)

    scores = jnp.asarray(rng.random((T, 32400)).astype(np.float32))
    t_topk = chain_ms(lambda s: jax.vmap(
        lambda x: jax.lax.top_k(x, 1000)[0])(s), scores, iters=50)

    nb = jnp.asarray(rng.normal(0, 10, (T, 1000, 5)).astype(np.float32))
    def iou_nms(b):
        def one(bb):
            iou = pairwise_iou_bev(bb, bb)
            return _greedy_alive(iou > 0.2, jnp.ones((1000,), bool))
        return jax.vmap(one)(b)
    t_iou = chain_ms(lambda b: iou_nms(b).astype(jnp.float32), nb, iters=50)
    print(f"decode+nms full {t_full:6.2f} | decode_single x7 {t_dec:6.2f} "
          f"| top_k x7 {t_topk:6.2f} | iou+jacobi x7 {t_iou:6.2f}",
          flush=True)

if __name__ == "__main__":
    main()
