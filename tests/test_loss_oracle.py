"""Loss-value parity oracle: `models.losses.center_head_loss` vs a verbatim
torch re-execution of the reference `CenterHead.loss`
(`/root/reference/det3d/models/bbox_heads/center_head.py:392-539`) and its
kernels (`det3d/models/losses/centernet_loss.py:7-95`,
`det3d/core/utils/center_utils.py:66-80`), on identical fabricated
predictions and targets.

Covers the mode dispatch quirks: per-timestep target indexing, the reversed
backcast list, sparse's constant anno_box[t=0] target, the [-2, -1] (rrot)
column selection of the 10-dim path every shipped config uses, code-weight /
forecast-code-weight application, and TWO_STAGE's vel+rot-only weights.
"""
import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
F = torch.nn.functional

from futuredet_tpu.config import HeadConfig
from futuredet_tpu.models.losses import center_head_loss

B, H, W, M = 2, 12, 16, 6
CW10 = (1.0, 0.95, 0.9, 0.85, 0.8, 0.75, 0.2, 0.25, 0.6, 0.55)


# ---------------------------------------------------------------------------
# verbatim torch ports of the reference loss kernels
# ---------------------------------------------------------------------------

def _t_gather(feat, ind):
    """ref _transpose_and_gather_feat (center_utils.py:76-80)."""
    feat = feat.permute(0, 2, 3, 1).contiguous()
    feat = feat.view(feat.size(0), -1, feat.size(3))
    ind2 = ind.unsqueeze(2).expand(ind.size(0), ind.size(1), feat.size(2))
    return feat.gather(1, ind2)


def _t_focal(out, target, ind, mask, cat):
    """ref FastFocalLoss (centernet_loss.py:75-95)."""
    mask = mask.float()
    gt = torch.pow(1 - target, 4)
    neg_loss = (torch.log(1 - out) * torch.pow(out, 2) * gt).sum()
    pos_pred = _t_gather(out, ind).gather(2, cat.unsqueeze(2))
    num_pos = mask.sum()
    pos_loss = (torch.log(pos_pred) * torch.pow(1 - pos_pred, 2)
                * mask.unsqueeze(2)).sum()
    if num_pos == 0:
        return -neg_loss
    return -(pos_loss + neg_loss) / num_pos


def _t_reg(output, mask, ind, target):
    """ref RegLoss (centernet_loss.py:18-25)."""
    pred = _t_gather(output, ind)
    mask = mask.float().unsqueeze(2)
    loss = F.l1_loss(pred * mask, target * mask, reduction="none")
    loss = loss / (mask.sum() + 1e-4)
    return loss.transpose(2, 0).sum(dim=2).sum(dim=1)


_COLS = [0, 1, 2, 3, 4, 5, 6, 7, -2, -1]


def _ref_loss(flags, T, preds, ex, cw, weight):
    """Verbatim dispatch of ref CenterHead.loss (:396-539) for the shipped
    no-rvel head set. flags: dict of the mode booleans."""
    two_stage = flags.get("two_stage", False)
    reverse = flags.get("reverse", False)
    sparse = flags.get("sparse", False)
    dense = flags.get("dense", False)
    classify = flags.get("classify", False)
    cwf = [c * m for c, m in zip(cw, [0, 0, 0, 0, 0, 0, 1, 1, 0, 0])]
    cw2 = [0, 0, 0, 0, 0, 0, 1, 1, 1, 1]
    totals, hms, locs = 0.0, [], []
    for task_id, pd in enumerate(preds):
        hm = torch.clamp(torch.sigmoid(pd["hm"]), 1e-4, 1 - 1e-4)
        if two_stage:
            hm_loss = torch.tensor(0.0)
        elif reverse:
            hm_loss = _t_focal(hm, ex["hm"][-1][0], ex["ind"][-1][0],
                               ex["mask"][-1][0], ex["cat"][-1][0])
        elif sparse:
            i0 = (T - 1) * task_id
            hm_loss = _t_focal(hm, ex["hm"][i0][0], ex["ind"][i0][0],
                               ex["mask"][i0][0], ex["cat"][i0][0])
        elif dense:
            hm_loss = _t_focal(hm, ex["hm"][task_id][0],
                               ex["ind"][task_id][0], ex["mask"][task_id][0],
                               ex["cat"][task_id][0])
        elif classify:
            hm_loss = _t_focal(hm, ex["hm_trajectory"][task_id][0],
                               ex["ind_trajectory"][task_id][0],
                               ex["mask_trajectory"][task_id][0],
                               ex["cat_trajectory"][task_id][0])
        else:
            hm_loss = _t_focal(hm, ex["hm"][0][0], ex["ind"][0][0],
                               ex["mask"][0][0], ex["cat"][0][0])

        if reverse:
            tb = [ex["anno_box"][i][0] for i in range(T)][::-1]
        elif sparse:
            tb = [ex["anno_box"][i][0] for i in range(T)]
            if task_id != 0:
                tb = tb[::-1]
        elif dense:
            tb = ex["anno_box"][task_id][0]
        elif classify:
            tb = ex["anno_box_trajectory"][task_id][0]
        else:
            tb = [ex["anno_box"][i][0] for i in range(T)]

        if dense or classify:
            pb = torch.cat([pd["reg"], pd["height"], pd["dim"], pd["vel"],
                            pd["rot"]], dim=1)
            tb = tb[..., _COLS]
        else:
            pb = [torch.cat([pd["reg"], pd["height"], pd["dim"],
                             pd["vel"][:, 2 * i:2 * i + 2], pd["rot"]], dim=1)
                  for i in range(T)]
            tb = [tb[i][..., _COLS] for i in range(T)]

        if reverse:
            bl = [_t_reg(pb[i], ex["mask"][-1][0], ex["ind"][-1][0], tb[i])
                  for i in range(T)]
        elif sparse:
            i0 = (T - 1) * task_id
            bl = [_t_reg(pb[i], ex["mask"][i0][0], ex["ind"][i0][0], tb[i0])
                  for i in range(T)]
        elif dense:
            bl = _t_reg(pb, ex["mask"][task_id][0], ex["ind"][task_id][0],
                        tb)
        elif classify:
            bl = _t_reg(pb, ex["mask_trajectory"][task_id][0],
                        ex["ind_trajectory"][task_id][0], tb)
        else:
            bl = [_t_reg(pb[i], ex["mask"][0][0], ex["ind"][0][0], tb[i])
                  for i in range(T)]

        loc_loss = []
        if two_stage:
            for i in range(T):
                loc_loss.append((bl[i] * bl[i].new_tensor(cw2)).sum())
        elif dense or classify:
            loc_loss.append((bl * bl.new_tensor(cw)).sum())
        else:
            for i in range(T):
                w_i = cw if i == 0 else cwf
                loc_loss.append((bl[i] * bl[i].new_tensor(w_i)).sum())
        totals = totals + hm_loss + weight * sum(loc_loss)
        hms.append(float(hm_loss))
        locs.append(float(sum(loc_loss)))
    return float(totals), hms, locs


# ---------------------------------------------------------------------------
# fabrication shared by both implementations
# ---------------------------------------------------------------------------

def _fab_family(rng, T, C):
    """One target family: (hm (B,T,H,W,C), ind, mask, cat, anno (B,T,M,14))
    with exact-1 gaussian peaks at the ind/cat positions."""
    hm = rng.uniform(0, 0.9, (B, T, H, W, C)).astype(np.float32)
    ind = rng.integers(0, H * W, (B, T, M)).astype(np.int32)
    mask = (rng.random((B, T, M)) > 0.35)
    cat = rng.integers(0, C, (B, T, M)).astype(np.int32)
    for b in range(B):
        for t in range(T):
            for m in range(M):
                if mask[b, t, m]:
                    hm[b, t, ind[b, t, m] // W, ind[b, t, m] % W,
                       cat[b, t, m]] = 1.0
    anno = rng.normal(0, 1, (B, T, M, 14)).astype(np.float32)
    return hm, ind, mask, cat, anno


def _fab_preds(rng, n_tasks, C, vel_ch):
    preds = []
    for _ in range(n_tasks):
        preds.append({
            "hm": rng.normal(0, 2, (B, H, W, C)).astype(np.float32),
            "reg": rng.normal(0, 1, (B, H, W, 2)).astype(np.float32),
            "height": rng.normal(0, 1, (B, H, W, 1)).astype(np.float32),
            "dim": rng.normal(0, 1, (B, H, W, 3)).astype(np.float32),
            "rot": rng.normal(0, 1, (B, H, W, 2)).astype(np.float32),
            "vel": rng.normal(0, 1, (B, H, W, vel_ch)).astype(np.float32),
        })
    return preds


def _to_example(hm, ind, mask, cat, anno, key=""):
    """Our (B, T, ...) arrays -> the reference's list-of-lists example."""
    T = hm.shape[1]
    ex = {}
    ex["hm" + key] = [[torch.from_numpy(
        hm[:, t].transpose(0, 3, 1, 2).copy())] for t in range(T)]
    ex["ind" + key] = [[torch.from_numpy(ind[:, t].astype(np.int64))]
                       for t in range(T)]
    ex["mask" + key] = [[torch.from_numpy(mask[:, t])] for t in range(T)]
    ex["cat" + key] = [[torch.from_numpy(cat[:, t].astype(np.int64))]
                       for t in range(T)]
    ex["anno_box" + key] = [[torch.from_numpy(anno[:, t])]
                            for t in range(T)]
    return ex


def _run_case(flags, T, seed):
    rng = np.random.default_rng(seed)
    dense = flags.get("dense", False)
    classify = flags.get("classify", False)
    sparse = flags.get("sparse", False)
    C = 3 if classify else 1
    n_tasks = T if (dense or classify) else (2 if sparse else 1)
    vel_ch = 2 if (dense or classify) else 2 * T
    preds_np = _fab_preds(rng, n_tasks, C, vel_ch)

    hm, ind, mask, cat, anno = _fab_family(rng, T, C)
    targets = {}
    ex = {}
    if classify:
        targets.update(hm_trajectory=jnp.asarray(hm), ind_trajectory=jnp.asarray(ind),
                       mask_trajectory=jnp.asarray(mask), cat_trajectory=jnp.asarray(cat),
                       anno_box_trajectory=jnp.asarray(anno))
        ex.update(_to_example(hm, ind, mask, cat, anno, key="_trajectory"))
        # the standard family must still exist (unused in this mode)
        hm2, ind2, mask2, cat2, anno2 = _fab_family(rng, T, 1)
        targets.update(hm=jnp.asarray(hm2), ind=jnp.asarray(ind2),
                       mask=jnp.asarray(mask2), cat=jnp.asarray(cat2),
                       anno_box=jnp.asarray(anno2))
        ex.update(_to_example(hm2, ind2, mask2, cat2, anno2))
    else:
        targets.update(hm=jnp.asarray(hm), ind=jnp.asarray(ind),
                       mask=jnp.asarray(mask), cat=jnp.asarray(cat),
                       anno_box=jnp.asarray(anno))
        ex.update(_to_example(hm, ind, mask, cat, anno))

    cfg = HeadConfig(timesteps=T, code_weights=CW10, weight=0.25, **flags)
    preds = [{k: jnp.asarray(v) for k, v in pd.items()} for pd in preds_np]
    ours = center_head_loss(cfg, preds, targets)

    preds_t = [{k: torch.from_numpy(v.transpose(0, 3, 1, 2).copy())
                for k, v in pd.items()} for pd in preds_np]
    want_total, want_hm, want_loc = _ref_loss(flags, T, preds_t, ex,
                                              list(CW10), 0.25)
    np.testing.assert_allclose(float(ours["loss"]), want_total, rtol=2e-5,
                               err_msg=str(flags))
    np.testing.assert_allclose(np.asarray(ours["hm_loss"]), want_hm,
                               rtol=2e-5, atol=1e-6, err_msg=str(flags))
    np.testing.assert_allclose(np.asarray(ours["loc_loss"]), want_loc,
                               rtol=2e-5, atol=1e-6, err_msg=str(flags))


@pytest.mark.parametrize("flags,T", [
    ({}, 1),                       # n0-style single-frame standard
    ({}, 3),                       # n3-style standard (cw vs cwf per step)
    ({"dense": True, "forecast_feature": True}, 3),   # n3dtf-style
    ({"reverse": True}, 3),
    ({"sparse": True}, 3),
    ({"classify": True}, 3),
    ({"two_stage": True}, 3),      # vel+rot-only weights, no hm loss
])
def test_loss_matches_torch_reference(flags, T):
    for seed in (0, 1):
        _run_case(flags, T, seed)
