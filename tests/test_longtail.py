"""Long-tail components: deformable conv, two-stage refiner, double-flip TTA,
head modes (sparse/classify/wide), TWO_STAGE freeze mask."""
import numpy as np
import jax
import jax.numpy as jnp

from tests.test_models import rand_points, tiny_cfg


def test_deform_conv_zero_offsets_equals_standard_conv():
    from futuredet_tpu.ops.deform import deform_conv2d
    rng = np.random.default_rng(0)
    B, H, W, C = 1, 8, 8, 8
    x = rng.normal(size=(B, H, W, C)).astype(np.float32)
    wts = rng.normal(size=(9, C, 4)).astype(np.float32) * 0.1
    offs = np.zeros((B, H, W, 4 * 2 * 9), np.float32)
    got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(offs),
                                   jnp.asarray(wts)))
    # standard 3x3 conv oracle (zero pad)
    ref = np.zeros((B, H, W, 4), np.float32)
    k = 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            shifted = np.zeros_like(x)
            ys = slice(max(dy, 0), H + min(dy, 0))
            yd = slice(max(-dy, 0), H + min(-dy, 0))
            xs = slice(max(dx, 0), W + min(dx, 0))
            xd = slice(max(-dx, 0), W + min(-dx, 0))
            shifted[:, yd, xd] = x[:, ys, xs]
            ref += shifted @ wts[k]
            k += 1
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_deform_conv_fractional_offset_interpolates():
    from futuredet_tpu.ops.deform import deform_conv2d
    B, H, W, C = 1, 6, 6, 4
    x = np.zeros((B, H, W, C), np.float32)
    x[0, 2, 2] = 1.0
    x[0, 2, 3] = 3.0
    # identity kernel on center tap only
    wts = np.zeros((9, C, C), np.float32)
    wts[4] = np.eye(C)
    offs = np.zeros((B, H, W, 4 * 2 * 9), np.float32)
    # shift the center tap by +0.5 in x for all groups
    offs[..., 1::2] = 0.5
    out = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(offs),
                                   jnp.asarray(wts)))
    np.testing.assert_allclose(out[0, 2, 2], 2.0, atol=1e-5)  # (1+3)/2


def test_dcn_sep_head_forward_and_grad():
    """dcn_head=True builds the DCNSepHead variant (ref center_head.py:
    176-228,317-318): forward produces every branch incl. hm from the
    adapted features, and gradients flow to the offset conv."""
    import dataclasses
    from futuredet_tpu.models.center_head import CenterHead

    cfg = tiny_cfg(1, False, False)
    head = dataclasses.replace(cfg.model.head, dcn_head=True,
                               in_channels=32, share_conv_channel=16)
    mod = CenterHead(cfg=head)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 8, 8, 32)).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(0), x, train=False)
    preds = mod.apply(variables, x, train=False)
    assert len(preds) == 1
    for k in ("hm", "reg", "height", "dim", "rot", "vel"):
        assert preds[0][k].shape[:3] == (1, 8, 8), k
    # offset conv zero-init -> taps at integer positions; hm bias init
    assert np.allclose(np.asarray(
        variables["params"]["task0"]["feature_adapt_cls"]["conv_offset"]
        ["kernel"]), 0.0)
    assert np.allclose(np.asarray(preds[0]["hm"]).mean(), -2.19, atol=0.5)

    def loss(params):
        out = mod.apply({"params": params,
                         "batch_stats": variables["batch_stats"]}, x,
                        train=False)
        return sum(jnp.sum(v ** 2) for v in out[0].values())

    grads = jax.grad(loss)(variables["params"])
    g_off = grads["task0"]["feature_adapt_cls"]["conv_offset"]["kernel"]
    assert np.isfinite(np.asarray(g_off)).all()
    g_adapt = grads["task0"]["feature_adapt_reg"]["adapt_kernel"]
    assert float(jnp.abs(g_adapt).sum()) > 0


def test_two_stage_refiner_and_freeze_mask():
    from futuredet_tpu.models.two_stage import (TwoStageRefiner,
                                                two_stage_trainable_mask)
    from futuredet_tpu.models.detector import build_detector

    cfg = tiny_cfg(1, False, False)
    ref = TwoStageRefiner(cfg=cfg)
    B, N = 2, 8
    bev = jnp.asarray(np.random.default_rng(0).normal(
        size=(B, 16, 16, 32)).astype(np.float32))
    boxes = jnp.zeros((B, N, 9)).at[..., 3:6].set(2.0)
    params = ref.init(jax.random.PRNGKey(0), bev, boxes)
    out_boxes, scores = ref.apply(params, bev, boxes)
    assert out_boxes.shape == (B, N, 9)
    assert scores.shape == (B, N)
    assert np.all((np.asarray(scores) >= 0) & (np.asarray(scores) <= 1))

    model = build_detector(cfg)
    pts, valid = rand_points()
    variables = model.init(jax.random.PRNGKey(0), pts, valid)
    mask = two_stage_trainable_mask(variables["params"])
    flat = jax.tree_util.tree_leaves_with_path(mask)
    trainable = [("/".join(str(p) for p in path)) for path, v in flat if v]
    frozen = [("/".join(str(p) for p in path)) for path, v in flat if not v]
    assert any("vel" in t for t in trainable)
    assert any("rot" in t for t in trainable)
    assert all("hm" not in t for t in trainable)
    assert len(frozen) > len(trainable)


def test_double_flip_tta_consistent_detections():
    from futuredet_tpu.eval.tta import infer_double_flip
    from futuredet_tpu.models.detector import build_detector
    from futuredet_tpu.data.synthetic import make_batch

    cfg = tiny_cfg(1, False, False)
    batch = make_batch(cfg, 1, seed=0, n_objects=4, n_clutter=500, max_objs=16)
    model = build_detector(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch["points"],
                           batch["points_valid"])

    def forward(p, v):
        return model.apply(variables, p, v, train=False)

    det = infer_double_flip(cfg, forward, batch["points"],
                            batch["points_valid"])
    T, post = 7, cfg.test.nms.post_max_size
    assert det.boxes.shape == (1, 4 * T * post, 9)
    # all four flip branches decode into the same world frame: every valid
    # box center must lie inside the pc range
    b = np.asarray(det.boxes[0])[np.asarray(det.valid[0])]
    if len(b):
        assert np.all(np.abs(b[:, :2]) <= 10.0 + 1e-3)


def test_sparse_classify_wide_modes_forward_and_loss():
    import dataclasses
    from futuredet_tpu.models.detector import build_detector
    from futuredet_tpu.models.losses import center_head_loss
    from tests.test_models import rand_targets

    for mode in ("sparse", "classify", "wide_head", "reverse"):
        cfg = tiny_cfg(7, False, False)
        head = dataclasses.replace(cfg.model.head, **{mode: True},
                                   timesteps=7)
        if mode == "wide_head":
            head = dataclasses.replace(head, share_conv_channel=32)
        cfg = cfg.replace(model=dataclasses.replace(cfg.model, head=head))
        model = build_detector(cfg)
        pts, valid = rand_points(B=1)
        variables = model.init(jax.random.PRNGKey(0), pts, valid)
        preds = model.apply(variables, pts, valid)
        assert len(preds) == len(cfg.model.head.num_classes), mode

        tg = rand_targets(cfg, B=1)
        W, H = cfg.feature_map_size
        M = cfg.assigner.max_objs
        # family shapes must match build_targets: the forecast family's
        # object axis is T*M (all timesteps' boxes in every map)
        extra = {}
        for fam, C, Mf in (("trajectory", 3, M), ("forecast", 7, 7 * M)):
            extra.update({
                f"hm_{fam}": jnp.zeros((1, 7, H, W, C)),
                f"ind_{fam}": jnp.zeros((1, 7, Mf), jnp.int32),
                f"mask_{fam}": jnp.zeros((1, 7, Mf), bool),
                f"cat_{fam}": jnp.zeros((1, 7, Mf), jnp.int32),
                f"anno_box_{fam}": jnp.zeros((1, 7, Mf, 14)),
            })
        losses = center_head_loss(cfg.model.head, preds, {**tg, **extra})
        assert np.isfinite(float(losses["loss"])), mode


def test_two_stage_head_has_shared_forecast_conv():
    import dataclasses
    import jax
    from futuredet_tpu.models.detector import build_detector
    cfg = tiny_cfg(1, False, False)
    head = dataclasses.replace(cfg.model.head, two_stage=True)
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, head=head))
    model = build_detector(cfg)
    pts, valid = rand_points(B=1)
    variables = model.init(jax.random.PRNGKey(0), pts, valid)
    names = str(jax.tree_util.tree_structure(variables["params"]))
    assert "two_stage_forecast_conv" in names
    preds = model.apply(variables, pts, valid)
    assert "vel" in preds[0] and "hm" in preds[0]


def test_proposal_targets_and_two_stage_loss():
    from futuredet_tpu.models.two_stage import proposal_targets, two_stage_loss
    # one perfect proposal, one background proposal
    gt = np.zeros((1, 2, 12), np.float32)
    gt[0, 0] = [5, 5, 0, 2, 4.5, 1.6, 0, 0, 0, 0, -np.pi / 2, -np.pi / 2]
    gt_valid = np.array([[True, False]])
    props = np.zeros((1, 2, 9), np.float32)
    props[0, 0] = [5, 5, 0, 2, 4.5, 1.6, 0, 0, -np.pi / 2]   # == gt
    props[0, 1] = [50, 50, 0, 2, 4.5, 1.6, 0, 0, -np.pi / 2]  # far away
    cls_t, reg_t, fg = proposal_targets(jnp.asarray(props[0]),
                                        jnp.asarray(gt[0]),
                                        jnp.asarray(gt_valid[0]))
    assert float(cls_t[0]) == 1.0 and float(cls_t[1]) == 0.0
    assert bool(fg[0]) and not bool(fg[1])
    np.testing.assert_allclose(np.asarray(reg_t[0]), 0.0, atol=1e-5)

    logits = jnp.asarray(np.array([[5.0, -5.0]], np.float32))  # confident
    resid = jnp.zeros((1, 2, 7))
    losses = two_stage_loss(logits, resid, jnp.asarray(props),
                            jnp.asarray(gt), jnp.asarray(gt_valid),
                            jnp.ones((1, 2), bool))
    assert float(losses["loss"]) < 0.1   # near-perfect predictions
    bad = two_stage_loss(-logits, resid, jnp.asarray(props), jnp.asarray(gt),
                         jnp.asarray(gt_valid), jnp.ones((1, 2), bool))
    assert float(bad["loss"]) > float(losses["loss"])


def test_map_unflip_decode_consistency():
    """decode(unflip_maps(pred)) == unflip_boxes(decode(pred)) cell-by-cell:
    validates the map-average double-flip transforms (eval/tta.py)."""
    import itertools

    import jax.numpy as jnp
    from futuredet_tpu.eval.decode import decode_single
    from futuredet_tpu.eval.tta import unflip_pred_maps
    from tests.test_models import tiny_cfg

    cfg = tiny_cfg(1, False, False)
    W, H = cfg.feature_map_size
    rng = np.random.default_rng(0)

    def mk():
        return {
            "hm": jnp.asarray(rng.normal(size=(1, H, W, 1)).astype(np.float32)),
            "reg": jnp.asarray(rng.uniform(0, 1, (1, H, W, 2)).astype(np.float32)),
            "height": jnp.asarray(rng.normal(size=(1, H, W, 1)).astype(np.float32)),
            "dim": jnp.asarray(rng.normal(size=(1, H, W, 3)).astype(np.float32)),
            "rot": jnp.asarray(rng.normal(size=(1, H, W, 2)).astype(np.float32)),
            "vel": jnp.asarray(rng.normal(size=(1, H, W, 2)).astype(np.float32)),
        }

    for fy, fx in itertools.product([False, True], repeat=2):
        pd = mk()
        bu, hu = decode_single(unflip_pred_maps(pd, fy, fx), cfg)
        bf, hf = decode_single(pd, cfg)
        bu = np.asarray(bu).reshape(H, W, 9)
        bf = np.asarray(bf).reshape(H, W, 9)
        hu = np.asarray(hu).reshape(H, W, -1)
        hfl = np.asarray(hf).reshape(H, W, -1)

        src = bf.copy()
        if fy:
            src = src[::-1]
            hfl = hfl[::-1]
        if fx:
            src = src[:, ::-1]
            hfl = hfl[:, ::-1]
        exp = src.copy()
        # stored-rot convention r = -physical_yaw - pi/2 (CLAUDE.md):
        # y flip: theta -> -theta  =>  r -> pi - r
        # x flip: theta -> pi - theta  =>  r -> -r
        if fy:
            exp[..., 1] *= -1          # y
            exp[..., 7] *= -1          # vy
            exp[..., 8] = np.pi - exp[..., 8]
        if fx:
            exp[..., 0] *= -1          # x
            exp[..., 6] *= -1          # vx
            exp[..., 8] *= -1
        # wrap yaw to (-pi, pi] for comparison
        du = (bu[..., 8] - exp[..., 8] + np.pi) % (2 * np.pi) - np.pi
        np.testing.assert_allclose(du, 0, atol=1e-5)
        np.testing.assert_allclose(bu[..., :8], exp[..., :8], atol=1e-4)
        np.testing.assert_allclose(hu, hfl, atol=1e-6)


def test_double_flip_map_average_e2e():
    import jax
    from futuredet_tpu.eval.tta import infer_double_flip_map
    from futuredet_tpu.models.detector import build_detector
    from tests.test_models import rand_points, tiny_cfg

    cfg = tiny_cfg(1, False, False)
    model = build_detector(cfg)
    pts, pv = rand_points(B=1, P=1024)
    variables = model.init(jax.random.PRNGKey(0), pts, pv, train=False)

    def fwd(p, v):
        return model.apply(variables, p, v, train=False)

    det = infer_double_flip_map(cfg, fwd, pts, pv)
    assert det.boxes.shape[0] == 1
    # standard detection slot count (not 4x like the box-level ensemble)
    T = cfg.model.head.target_timesteps
    assert det.boxes.shape[1] == T * cfg.test.nms.post_max_size
    assert np.isfinite(np.asarray(det.boxes)).all()


def test_map_unflip_physical_roundtrip():
    """Ground-truth-physics oracle: simulate a PERFECT model on flipped
    worlds (maps encode the flipped-world boxes, derived from indisputable
    flip physics: y flip theta->-theta, x flip theta->pi-theta) and check
    unflip_pred_maps + decode recovers the CANONICAL box."""
    import itertools

    import jax.numpy as jnp
    from futuredet_tpu.eval.decode import decode_single
    from futuredet_tpu.eval.tta import unflip_pred_maps
    from tests.test_models import tiny_cfg

    cfg = tiny_cfg(1, False, False)
    W, H = cfg.feature_map_size
    vx_m, vy_m = cfg.voxel.voxel_size[:2]
    x0, y0 = cfg.voxel.pc_range[:2]
    osf = cfg.assigner.out_size_factor

    theta = 0.7                      # physical yaw, canonical world
    cx, cy = 2.3, -3.1               # center, canonical world
    vel = np.array([1.5, -0.8])      # physical velocity

    for fy, fx in itertools.product([False, True], repeat=2):
        th_f, c_f, v_f = theta, np.array([cx, cy]), vel.copy()
        if fy:
            th_f = -th_f
            c_f = c_f * np.array([1, -1])
            v_f = v_f * np.array([1, -1])
        if fx:
            th_f = np.pi - th_f
            c_f = c_f * np.array([-1, 1])
            v_f = v_f * np.array([-1, 1])
        r_f = -th_f - np.pi / 2      # stored rot in the flipped world

        # perfect flipped-world maps: one hot cell at the box center
        gx = (c_f[0] - x0) / vx_m / osf
        gy = (c_f[1] - y0) / vy_m / osf
        ix, iy = int(gx), int(gy)
        maps = {k: jnp.zeros((1, H, W, c), jnp.float32)
                for k, c in (("hm", 1), ("reg", 2), ("height", 1),
                             ("dim", 3), ("rot", 2), ("vel", 2))}
        maps["hm"] = maps["hm"].at[0, iy, ix, 0].set(9.0)
        maps["reg"] = maps["reg"].at[0, iy, ix].set(
            jnp.asarray([gx - ix, gy - iy]))
        maps["rot"] = maps["rot"].at[0, iy, ix].set(
            jnp.asarray([np.sin(r_f), np.cos(r_f)]))
        maps["vel"] = maps["vel"].at[0, iy, ix].set(jnp.asarray(v_f))

        un = unflip_pred_maps(maps, fy, fx)
        boxes, hm = decode_single(un, cfg)
        cell = int(np.argmax(np.asarray(hm)[0, :, 0]))
        box = np.asarray(boxes)[0, cell]
        np.testing.assert_allclose(box[0], cx, atol=1e-4)
        np.testing.assert_allclose(box[1], cy, atol=1e-4)
        np.testing.assert_allclose(box[6:8], vel, atol=1e-5)
        r_expect = -theta - np.pi / 2
        dr = (box[8] - r_expect + np.pi) % (2 * np.pi) - np.pi
        np.testing.assert_allclose(dr, 0, atol=1e-5,
                                   err_msg=f"fy={fy} fx={fx}")


def test_all_head_modes_train_with_real_targets():
    """init_state -> train step -> decode for every unexposed head mode,
    with REAL build_targets families (the fabricated families in the test
    above once hid a wide-head forecast/trajectory object-axis mismatch)."""
    import dataclasses

    import jax
    from futuredet_tpu.data.synthetic import make_batch
    from futuredet_tpu.eval.decode import decode_and_nms
    from futuredet_tpu.parallel.mesh import make_mesh
    from futuredet_tpu.train.step import (init_state, make_eval_forward,
                                          make_train_step)

    for mode in ("sparse", "classify", "wide_head", "reverse"):
        cfg = tiny_cfg(7, False, False)
        head = dataclasses.replace(cfg.model.head, **{mode: True},
                                   timesteps=7)
        if mode == "wide_head":
            head = dataclasses.replace(head, share_conv_channel=32)
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, head=head),
            assigner=dataclasses.replace(cfg.assigner,
                                         sampler_type="trajectory"))
        batch = make_batch(cfg, 1, seed=0, n_objects=4, n_clutter=200,
                           max_objs=16)
        batch.pop("gt")
        state = init_state(cfg, jax.random.PRNGKey(0), batch, total_steps=8)
        step = make_train_step(cfg, make_mesh(1), total_steps=8)
        first = last = None
        for _ in range(8):
            state, m = step(state, batch)
            last = float(m["loss"])
            first = first if first is not None else last
        assert np.isfinite(last) and last < first, (mode, first, last)
        fwd = make_eval_forward(cfg)
        det = decode_and_nms(cfg, fwd(state.params, state.batch_stats,
                                      batch))
        assert np.isfinite(np.asarray(det.boxes)).all(), mode
