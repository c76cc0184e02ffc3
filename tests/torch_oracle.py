"""Independent fixed-semantics PyTorch oracle of AOC-Net ``forward_for_eval``.

Written from the reference's *intended* semantics (SURVEY.md §2.4-2.6 with
the §2.9 release fixes) as a plain functional torch implementation — NOT a
copy of either the reference code or the JAX model.  It consumes a
reference-style torch state dict (the output of ``_torchify``, the inverse
of ``rvos_tpu.engine.checkpoint.convert_torch_statedict``), so the parity
test exercises BOTH the math and the weight-converter layout conventions:
random flax params → torchify → this oracle must compute the same function
as ``AOCNet.full_forward`` (SURVEY §7/M2's bit-level target).

Reference citations for each stage:
  * backbone: ``networks/deeplab/{deeplab,aspp,decoder}.py``,
    ``backbone/resnet.py``; FrozenBatchNorm ``layers/normalization.py:6-24``
  * semantic embedding: ``networks/aoc/aocnet.py:19-25``
  * global matching: ``layers/matching.py:27-91,200-249,2305-2381``
  * cluster (AOP) matching: ``matching.py:506-640`` — channel order
    [kmeans centroids, cluster means]; the k-means itself is the
    TPU rebuild's deterministic formulation (fixed iters, seeded init
    scores supplied by the caller) since SciPy's ``kmeans2`` is not
    reproducible across frameworks
  * attention heads: ``layers/attention.py:79-189``
  * proxy matching: ``matching.py:1162-1241``; proxy-reconstructed
    previous embedding ``aocnet.py:325``
  * local matching: ``matching.py:2710-2849`` (unfold windows, mask-
    replace with 5e4, squash before upsample, full-radius channel first)
  * fg→bg: ``matching.py:9-23``; concat order ``aocnet.py:349-358``
  * decoder: ``networks/aoc/decoding_module.py:96-240``,
    ``conditioning_layer.py:6-87`` (§2.9 wiring fixes), ``layers/gct.py``,
    ``layers/aspp.py:33-78``, ``layers/attention.py:7-17``
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

WRONG = 5.0e4
EPS = 1e-5


def _t(a):
    if isinstance(a, torch.Tensor):      # differentiable train-oracle path
        return a
    return torch.from_numpy(np.array(a, copy=True)).float()


def _conv(sd, p, x, stride=1, padding=0, dilation=1, groups=1):
    w = _t(sd[p + ".weight"])
    b = _t(sd[p + ".bias"]) if p + ".bias" in sd else None
    return F.conv2d(x, w, b, stride=stride, padding=padding,
                    dilation=dilation, groups=groups)


def _fbn(sd, p, x):
    """FrozenBatchNorm2d (normalization.py:6-24)."""
    w, b = _t(sd[p + ".weight"]), _t(sd[p + ".bias"])
    m, v = _t(sd[p + ".running_mean"]), _t(sd[p + ".running_var"])
    scale = w * torch.rsqrt(v + EPS)
    return x * scale[None, :, None, None] + (b - m * scale)[None, :, None, None]


def _gn(sd, p, x, groups):
    return F.group_norm(x, groups, _t(sd[p + ".weight"]), _t(sd[p + ".bias"]),
                        eps=EPS)


def _linear(sd, p, h):
    return F.linear(h, _t(sd[p + ".weight"]), _t(sd[p + ".bias"]))


# ---------------------------------------------------------------------------
# feature extraction
# ---------------------------------------------------------------------------

def _res_bottleneck(sd, p, x, stride, dilation, has_ds):
    out = F.relu(_fbn(sd, p + ".bn1", _conv(sd, p + ".conv1", x)))
    out = F.relu(_fbn(sd, p + ".bn2",
                      _conv(sd, p + ".conv2", out, stride=stride,
                            padding=dilation, dilation=dilation)))
    out = _fbn(sd, p + ".bn3", _conv(sd, p + ".conv3", out))
    res = x
    if has_ds:
        res = _fbn(sd, p + ".downsample.1",
                   _conv(sd, p + ".downsample.0", x, stride=stride))
    return F.relu(out + res)


def _resnet101(sd, x):
    p = "feature_extracter.backbone"
    x = _conv(sd, p + ".conv1", x, stride=2, padding=3)
    x = F.relu(_fbn(sd, p + ".bn1", x))
    x = F.max_pool2d(x, 3, stride=2, padding=1)

    def layer(x, name, planes, n, stride, dilation, grid=None):
        inpl = x.shape[1]
        for i in range(n):
            d = dilation * (grid[i] if grid else 1)
            s = stride if i == 0 else 1
            ds = (i == 0) and (stride != 1 or inpl != planes * 4)
            x = _res_bottleneck(sd, f"{p}.{name}.{i}", x, s, d, ds)
            inpl = planes * 4
        return x

    x = layer(x, "layer1", 64, 3, 1, 1)
    low = x
    x = layer(x, "layer2", 128, 4, 2, 1)
    x = layer(x, "layer3", 256, 23, 2, 1)
    x = layer(x, "layer4", 512, 3, 1, 2, grid=(1, 2, 4))
    return x, low


def _deeplab_aspp(sd, x):
    p = "feature_extracter.aspp"
    outs = []
    for name, (k, d) in zip(("aspp1", "aspp2", "aspp3", "aspp4"),
                            ((1, 1), (3, 6), (3, 12), (3, 18))):
        pad = 0 if k == 1 else d
        y = _conv(sd, f"{p}.{name}_conv", x, padding=pad, dilation=d)
        outs.append(F.relu(_fbn(sd, f"{p}.{name}_bn", y)))
    x5 = x.mean(dim=(2, 3), keepdim=True)
    x5 = F.relu(_fbn(sd, p + ".gap_bn", _conv(sd, p + ".gap_conv", x5)))
    x5 = x5.expand(-1, -1, outs[0].shape[2], outs[0].shape[3])
    x = torch.cat(outs + [x5], dim=1)
    return F.relu(_fbn(sd, p + ".bn1", _conv(sd, p + ".conv1", x)))


def _deeplab_decoder(sd, x, low):
    p = "feature_extracter.decoder"
    ll = F.relu(_fbn(sd, p + ".bn1", _conv(sd, p + ".conv1", low)))
    x = F.interpolate(x, size=ll.shape[2:], mode="bilinear",
                      align_corners=True)
    x = torch.cat([x, ll], dim=1)
    x = F.relu(_fbn(sd, p + ".last_bn0",
                    _conv(sd, p + ".last_conv0", x, padding=1)))
    x = F.relu(_fbn(sd, p + ".last_bn1",
                    _conv(sd, p + ".last_conv1", x, padding=1)))
    return x


def extract_feature(sd, imgs_nchw, gn_groups=32, gn_emb_groups=25):
    """[N,3,H,W] → (embedding [N,emb,h4,w4], low-level [N,256,h4,w4])."""
    feats, low = _resnet101(sd, imgs_nchw)
    x = _deeplab_aspp(sd, feats)
    x = _deeplab_decoder(sd, x, low)
    p = "semantic_embedding"
    c = x.shape[1]
    x = _conv(sd, p + ".seperate_conv", x, padding=1, groups=c)
    x = F.relu(_gn(sd, p + ".bn1", x, gn_groups))
    x = _conv(sd, p + ".embedding_conv", x)
    x = F.relu(_gn(sd, p + ".bn2", x, gn_emb_groups))
    return x, low


# ---------------------------------------------------------------------------
# matching streams
# ---------------------------------------------------------------------------

def _squash(d, bias):
    """(sigmoid(d + bias) - 0.5) * 2, bias broadcast over the trailing
    axes after the object axis (matching.py:2372)."""
    shape = [1] * d.dim()
    shape[-2] = -1
    return (torch.sigmoid(d + bias.view(*shape)) - 0.5) * 2.0


def global_matching(q, r_emb, r_lab, bias):
    """q [M,C], r_emb [R,C], r_lab [R,O] → squashed min-dists [M,O]."""
    q2 = q.pow(2).sum(1)
    r2 = r_emb.pow(2).sum(1)
    d = q2[:, None] + r2[None, :] - 2.0 * q @ r_emb.t()          # [M, R]
    wrong = (r_lab < 0.1).float()                                 # [R, O]
    dm = (d[:, :, None] + wrong[None] * WRONG).min(dim=1).values  # [M, O]
    return _squash(dm[:, :, None], bias)[..., 0]


def kmeans_banks(pts, weights, scores, k, iters):
    """Deterministic Lloyd (the TPU rebuild's kmeans formulation) for one
    object: ``scores`` are the caller-provided init scores (uniform draws
    masked by the fg weights); top-k picks k distinct init points."""
    top_scores, idx = torch.topk(scores, k)
    cent_valid = top_scores > 0.0
    cent = pts[idx].clone()
    w = weights.float()

    def assign(c):
        d = (pts.pow(2).sum(1, keepdim=True) + c.pow(2).sum(1)[None]
             - 2.0 * pts @ c.t())
        d = torch.where(cent_valid[None], d, torch.full_like(d, np.inf))
        lab = d.argmin(dim=1)
        onehot = F.one_hot(lab, k).float() * w[:, None]
        return onehot

    for _ in range(iters):
        onehot = assign(cent)
        counts = onehot.sum(0)
        sums = onehot.t() @ pts
        cent = torch.where(counts[:, None] > 0,
                           sums / counts.clamp(min=1.0)[:, None], cent)
    onehot = assign(cent)
    counts = onehot.sum(0)
    sums = onehot.t() @ pts
    means = torch.where(counts[:, None] > 0,
                        sums / counts.clamp(min=1.0)[:, None], cent)
    mean_valid = (counts > 0) & cent_valid
    return cent, cent_valid, means, mean_valid


def cluster_matching(q, r_emb, r_lab, bias, scores, k, iters):
    """AOP matching (matching.py:506-640 intended semantics): per object
    k-means over its reference pixels; two output channels per object —
    min distance to the centroid bank and to the cluster-mean bank."""
    o = r_lab.shape[1]
    q2 = q.pow(2).sum(1)
    d1s, d2s = [], []
    for i in range(o):
        cent, cv, means, mv = kmeans_banks(r_emb, r_lab[:, i],
                                           scores[i] * r_lab[:, i], k, iters)

        def bank_min(bank, valid):
            d = (q2[:, None] + bank.pow(2).sum(1)[None] - 2.0 * q @ bank.t())
            d = d + (1.0 - valid.float())[None] * WRONG
            return d.min(dim=1).values

        d1s.append(bank_min(cent, cv))
        d2s.append(bank_min(means, mv))
    d = torch.stack([torch.stack(d1s, 1), torch.stack(d2s, 1)], dim=-1)
    return _squash(d, bias)                                       # [M, O, 2]


def attention_heads(r_emb, r_lab, p_emb, p_lab, epsilon):
    """Masked pos/neg GAPs (attention.py:79-131); flat [R,C]/[R,O] inputs
    (the eval variant's bank-summed numerators/denominators reduce to one
    flat masked GAP over the concatenated bank)."""
    def pos_neg(emb, lab):
        pos_sum = lab.t() @ emb                                   # [O, C]
        pos_num = lab.sum(0)[:, None]
        tot_sum = emb.sum(0)[None]
        tot_num = float(emb.shape[0])
        pos = pos_sum / (pos_num + epsilon)
        neg = (tot_sum - pos_sum) / (tot_num - pos_num + epsilon)
        return pos, neg

    rp, rn = pos_neg(r_emb, r_lab)
    pp, pn = pos_neg(p_emb, p_lab)
    return torch.cat([rp, rn, pp, pn], dim=1), rp, pp


def proxy_matching(q, proxies, bias):
    q2 = q.pow(2).sum(1)
    p2 = proxies.pow(2).sum(1)
    d = q2[:, None] + p2[None] - 2.0 * q @ proxies.t()            # [M, O]
    return _squash(d[:, :, None], bias)[..., 0]


def local_matching(query_hwc, prev_hwc, labels_hwo, bias, radii,
                   allow_downsample=True, atrous_rate=1):
    """Reference local matching (matching.py:2710-2849): downsample 2×,
    unfold the padded previous frame into (2D/a+1)² windows, mask-replace
    wrong-label offsets with 5e4, min per radius (full radius first),
    squash, then upsample back.  Returns [H, W, O, n_radii]."""
    ori_h, ori_w, c = query_hwc.shape
    o = labels_hwo.shape[-1]
    max_d = int(radii[-1])

    x = query_hwc.permute(2, 0, 1)[None]                          # [1,C,h,w]
    y = prev_hwc.permute(2, 0, 1)[None]
    if allow_downsample:
        dh, dw = ori_h // 2 + 1, ori_w // 2 + 1
        x = F.interpolate(x, size=(dh, dw), mode="bilinear",
                          align_corners=True)
        y = F.interpolate(y, size=(dh, dw), mode="bilinear",
                          align_corners=True)
    _, _, h, w = x.shape

    pad_d = max_d - max_d % atrous_rate
    a_max = pad_d // atrous_rate
    k = 2 * a_max + 1

    x2 = x.pow(2).sum(1).view(h, w, 1)
    y2 = y.pow(2).sum(1).view(1, 1, h, w)
    pad = (pad_d,) * 4
    py = F.pad(y, pad)
    py2 = F.pad(y2, pad, value=WRONG)
    off_y = F.unfold(py, kernel_size=(h, w), stride=atrous_rate)
    off_y = off_y.view(c, h * w, -1).permute(1, 0, 2)             # [hw,C,K²]
    off_y2 = F.unfold(py2, kernel_size=(h, w), stride=atrous_rate)
    off_y2 = off_y2.view(h, w, -1)                                # [h,w,K²]
    xq = x.view(c, h * w, 1).permute(1, 2, 0)                     # [hw,1,C]
    d = x2 + off_y2 - 2.0 * torch.matmul(xq, off_y).view(h, w, -1)

    lab = labels_hwo.permute(2, 0, 1)[None].float()               # [1,O,h',w']
    if (h, w) != (ori_h, ori_w):
        lab = F.interpolate(lab, size=(h, w), mode="nearest")
    plab = F.pad(lab.permute(1, 0, 2, 3), pad, value=0.0)         # [O,1,..]
    masks = F.unfold(plab, kernel_size=(h, w), stride=atrous_rate)
    masks = masks.view(o, h, w, -1).permute(1, 2, 3, 0) > 0.9     # [h,w,K²,O]

    d_tiled = d[..., None].expand(-1, -1, -1, o)
    d_masked = torch.where(masks, d_tiled, torch.full_like(d_tiled, WRONG))
    full_min = d_masked.min(dim=2).values                         # [h,w,O]
    multi = [full_min.permute(2, 0, 1)[:, None]]                  # [O,1,h,w]
    cube = d_masked.view(h, w, k, k, o)
    for r in radii[:-1]:
        r = int(r) // atrous_rate
        lo, hi = a_max - r, a_max + r + 1
        sub = cube[:, :, lo:hi, lo:hi, :].reshape(h, w, -1, o)
        multi.append(sub.min(dim=2).values.permute(2, 0, 1)[:, None])
    md = torch.cat(multi, dim=1)                                  # [O,n,h,w]
    md = (torch.sigmoid(md + bias.view(-1, 1, 1, 1)) - 0.5) * 2.0
    if (h, w) != (ori_h, ori_w):
        md = F.interpolate(md, size=(ori_h, ori_w), mode="bilinear",
                           align_corners=True)
    return md.permute(2, 3, 0, 1)                                 # [H,W,O,n]


def foreground2background(dis_hwon):
    """Per object, min over the other objects' maps (matching.py:9-23);
    single object → unchanged."""
    o = dis_hwon.shape[2]
    if o <= 1:
        return dis_hwon
    outs = []
    for i in range(o):
        others = [dis_hwon[:, :, j] for j in range(o) if j != i]
        outs.append(torch.stack(others, dim=2).min(dim=2).values)
    return torch.stack(outs, dim=2)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def _ia_gate(sd, p, x, head):
    a = _linear(sd, p + ".IA", head)
    return x * (1.0 + torch.tanh(a))[:, :, None, None]


def _gct(sd, p, x):
    alpha, gamma, beta = (_t(sd[p + ".alpha"]), _t(sd[p + ".gamma"]),
                          _t(sd[p + ".beta"]))
    embedding = (x.pow(2).sum((2, 3), keepdim=True) + EPS).pow(0.5) * alpha
    norm = gamma / (embedding.pow(2).mean(dim=1, keepdim=True) + EPS).pow(0.5)
    return x * (1.0 + torch.tanh(embedding * norm + beta))


def _gn_bottleneck(sd, p, x, stride=1, dilation=1):
    out = _gct(sd, p + ".GCT1", x)
    out = F.relu(_gn(sd, p + ".bn1", _conv(sd, p + ".conv1", out), 32))
    out = F.relu(_gn(sd, p + ".bn2",
                     _conv(sd, p + ".conv2", out, stride=stride,
                           padding=dilation, dilation=dilation), 32))
    out = _gn(sd, p + ".bn3", _conv(sd, p + ".conv3", out), 32)
    res = x
    if p + ".downsample.0.weight" in sd:
        res = _gn(sd, p + ".downsample_gn",
                  _conv(sd, p + ".downsample.0", x, stride=stride), 32)
    return F.relu(out + res)


def _cond_layer(sd, p, z, beta_pct):
    if z.dim() == 2:
        return _linear(sd, p + ".mlp_layer", z)
    o, c, h, w = z.shape
    phi = _conv(sd, p + ".phi_layer", z).view(o, h * w)
    beta_rank = max(1, int(beta_pct * h * w))
    kth = torch.topk(phi, beta_rank, dim=-1).values[:, -1:]
    mask = (phi > kth).float()
    pooled = (z.view(o, c, h * w) * mask[:, None]).sum(-1) / float(h * w)
    return _linear(sd, p + ".mlp_layer", pooled)


def _cond_block(sd, p, x, head, beta_pct):
    px = x.mean(dim=(2, 3))
    delta = px.sum(0, keepdim=True) - px
    cl1 = _cond_layer(sd, p + ".CL_1", x, beta_pct)
    cl2 = _cond_layer(sd, p + ".CL_2", delta, beta_pct)
    cl3 = _cond_layer(sd, p + ".CL_3", head, 1.0)
    a = _linear(sd, p + ".mlp_layer", torch.cat([cl1, cl2, cl3], dim=1))
    return x * (1.0 + torch.tanh(a))[:, :, None, None]


def _gn_aspp(sd, p, x):
    outs = []
    for name, (k, d) in zip(("aspp1", "aspp2", "aspp3", "aspp4"),
                            ((1, 1), (3, 6), (3, 12), (3, 18))):
        y = _gct(sd, f"{p}.{name}.GCT", x)
        pad = 0 if k == 1 else d
        y = _conv(sd, f"{p}.{name}.atrous_conv", y, padding=pad, dilation=d)
        outs.append(F.relu(_gn(sd, f"{p}.{name}.bn", y, 32)))
    x5 = x.mean(dim=(2, 3), keepdim=True)
    x5 = F.relu(_conv(sd, p + ".global_conv", x5))
    x5 = x5.expand(-1, -1, outs[0].shape[2], outs[0].shape[3])
    x = torch.cat(outs + [x5], dim=1)
    x = _gct(sd, p + ".GCT", x)
    return F.relu(_gn(sd, p + ".bn1", _conv(sd, p + ".conv1", x), 32))


def _modulator(sd, prefix, x, mem, head):
    x = torch.cat([x, mem], dim=1)
    x = _ia_gate(sd, f"{prefix}_Reweight_Layer_1", x, head)
    x = _gn_bottleneck(sd, f"{prefix}_Bottleneck_1", x)
    x = _ia_gate(sd, f"{prefix}_Reweight_Layer_2", x, head)
    x = _gn_bottleneck(sd, f"{prefix}_Bottleneck_2", x)
    x = _ia_gate(sd, f"{prefix}_Reweight_Layer_3", x, head)
    x = _gn_bottleneck(sd, f"{prefix}_Bottleneck_3", x)
    return x


def _ia_logit(sd, p, x, head):
    c = x.shape[1]
    out = _linear(sd, p, head)
    weight, bias = out[:, :c], out[:, -1]
    return torch.einsum("ochw,oc->ohw", x, weight) + bias[:, None, None]


def calibration_decoding(sd, x, head, low_level, beta_pct, refine_dim=64,
                         memory=(None, None)):
    """decoding_module.py:96-225 with the §2.9 fixes.

    ``memory``: the 2-slot per-video feature memory (None slots fall
    back to the current features, decoding_module.py:133-140).  Returns
    ``(fg_logits, new_memory)`` where new_memory = [post-ASPP features
    of THIS frame (detached), slot-1 unchanged once set]
    (decoding_module.py:148)."""
    p = "dynamic_seghead"
    x = _ia_gate(sd, p + ".IA1", x, head)
    x = _gn_bottleneck(sd, p + ".layer1", x)
    x = _cond_block(sd, p + ".CLB2", x, head, beta_pct)
    x = _gn_bottleneck(sd, p + ".layer2", x, 1, 2)
    x = _cond_block(sd, p + ".CLB3", x, head, beta_pct)
    x = _gn_bottleneck(sd, p + ".layer3", x, 2)
    x = _cond_block(sd, p + ".CLB4", x, head, beta_pct)
    x = _gn_bottleneck(sd, p + ".layer4", x, 1, 2)
    x = _cond_block(sd, p + ".CLB5", x, head, beta_pct)
    x = _gn_bottleneck(sd, p + ".layer5", x, 1, 4)

    px = x.mean(dim=(2, 3))
    delta = px.sum(0, keepdim=True) - px
    x = _ia_gate(sd, p + ".IA9", x, torch.cat([head, delta], dim=1))
    x = _gn_aspp(sd, p + ".ASPP", x)

    x_cur_1 = x.detach()
    mem0 = x_cur_1 if memory[0] is None else memory[0]
    x = _modulator(sd, p + ".M1", x, mem0, head)
    x_cur_2 = x.detach()
    mem1 = x_cur_2 if memory[1] is None else memory[1]
    x = _modulator(sd, p + ".M2", x, mem1, head)
    new_memory = (x_cur_1, mem1)

    # decoder_final (decoding_module.py:162-190)
    x = F.interpolate(x, size=low_level.shape[2:], mode="bicubic",
                      align_corners=True)
    ll = _gct(sd, p + ".GCT_sc", low_level)
    ll = _conv(sd, p + ".conv_sc", ll)
    ll = F.relu(_gn(sd, p + ".bn_sc", ll, refine_dim // 4))
    ll = ll.expand(x.shape[0], -1, -1, -1)
    x = torch.cat([x, ll], dim=1)
    px = x.mean(dim=(2, 3))
    delta = px.sum(0, keepdim=True) - px
    x = _ia_gate(sd, p + ".IA10", x, torch.cat([head, delta], dim=1))
    x = F.relu(_gn(sd, p + ".bn1", _conv(sd, p + ".conv1", x, padding=1), 32))
    px = x.mean(dim=(2, 3))
    delta = px.sum(0, keepdim=True) - px
    x = _ia_gate(sd, p + ".IA11", x, torch.cat([head, delta], dim=1))
    x = F.relu(_gn(sd, p + ".bn2", _conv(sd, p + ".conv2", x, padding=1), 32))

    fg = _ia_logit(sd, p + ".IA_final_fg", x, head)
    bg = _ia_logit(sd, p + ".IA_final_bg", x, head)
    # augment_background_logit (decoding_module.py:213-225)
    o = fg.shape[0]
    if o > 1:
        aug = bg[1:].min(dim=0).values
        fg = torch.cat([(fg[0] + aug)[None], fg[1:]], dim=0)
    return fg, new_memory                                         # [O, h, w]


# ---------------------------------------------------------------------------
# full forward (mirrors AOCNet.full_forward: one ref=prev frame pair)
# ---------------------------------------------------------------------------

def torch_full_forward(sd, imgs, labels, cfg, kmeans_uniforms):
    """sd: reference-style torch state dict (numpy values).
    imgs: [3, H, W, 3] float32 (ref, prev, cur); labels: [h4, w4] int
    (both the reference and the previous frame label, as in
    ``AOCNet.full_forward``); kmeans_uniforms: [O, R] the uniform init
    draws the JAX side gets from its PRNG (the only non-shared state).
    Returns a dict of intermediates + final logits [O, h4, w4]."""
    with torch.no_grad():
        return _torch_full_forward(sd, imgs, labels, cfg, kmeans_uniforms)


def _torch_full_forward(sd, imgs, labels, cfg, kmeans_uniforms):
    o = cfg.MODEL_MAX_OBJ_NUM
    imgs_nchw = _t(imgs).permute(0, 3, 1, 2)
    emb, low = extract_feature(sd, imgs_nchw, cfg.MODEL_GN_GROUPS,
                               cfg.MODEL_GN_EMB_GROUPS)
    ref_emb, prev_emb, cur_emb = emb[0], emb[1], emb[2]           # [C,h,w]
    cur_low = low[2][None]                                        # [1,256,h,w]
    c, h, w = cur_emb.shape

    lab = torch.from_numpy(np.asarray(labels)).long()
    onehot = F.one_hot(lab, o).float()                            # [h,w,O]

    bias = torch.cat([_t(sd["bg_bias"]),
                      _t(sd["fg_bias"]).expand(o - 1)])           # [O]

    q = cur_emb.permute(1, 2, 0).reshape(h * w, c)
    r_flat = ref_emb.permute(1, 2, 0).reshape(h * w, c)
    p_flat = prev_emb.permute(1, 2, 0).reshape(h * w, c)
    lab_flat = onehot.reshape(h * w, o)

    global_fg = global_matching(q, r_flat, lab_flat, bias)        # [M,O]
    global_cluster = cluster_matching(
        q, r_flat, lab_flat, bias, _t(kmeans_uniforms),
        cfg.MODEL_CLUSTER_NUM, cfg.MODEL_KMEANS_ITERS)            # [M,O,2]

    head, ref_pos, prev_pos = attention_heads(
        r_flat, lab_flat, p_flat, lab_flat, cfg.MODEL_EPSILON)    # [O,4C]

    global_proxy = proxy_matching(q, ref_pos, bias)               # [M,O]
    prev_inst = (lab_flat @ prev_pos).reshape(h, w, c)            # [h,w,C]

    radii = tuple(cfg.MODEL_MULTI_LOCAL_DISTANCE)
    cur_hwc = cur_emb.permute(1, 2, 0)
    local_fg = local_matching(cur_hwc, prev_emb.permute(1, 2, 0), onehot,
                              bias, radii, cfg.MODEL_LOCAL_DOWNSAMPLE,
                              cfg.TEST_LOCAL_ATROUS_RATE)         # [h,w,O,n]
    local_proxy = local_matching(cur_hwc, prev_inst, onehot, bias, radii,
                                 cfg.MODEL_LOCAL_DOWNSAMPLE,
                                 cfg.TEST_LOCAL_ATROUS_RATE)

    parts = [global_fg.view(h, w, o, 1), global_cluster.view(h, w, o, 2),
             global_proxy.view(h, w, o, 1), local_fg, local_proxy,
             onehot[..., None]]
    if cfg.MODEL_MATCHING_BACKGROUND:
        parts.append(foreground2background(local_fg))
        parts.append(foreground2background(global_fg.view(h, w, o, 1)))
    maps = torch.cat(parts, dim=-1)                               # [h,w,O,n_ch]
    maps = maps.permute(2, 3, 0, 1)                               # [O,n_ch,h,w]

    pre = _conv(sd, "dynamic_prehead.conv", maps)
    pre = F.relu(_gn(sd, "dynamic_prehead.bn", pre,
                     cfg.MODEL_PRE_HEAD_EMBEDDING_DIM // 4))
    cur_rep = cur_emb[None].expand(o, -1, -1, -1)
    x = torch.cat([cur_rep, pre], dim=1)                          # [O,164,h,w]

    logits, _ = calibration_decoding(sd, x, head, cur_low,
                                     cfg.MODEL_BETA_PERCENTAGE,
                                     cfg.MODEL_REFINE_CHANNELS)
    return {
        "emb": emb.numpy(), "low": low.numpy(),
        "global_fg": global_fg.view(h, w, o, 1).numpy(),
        "global_cluster": global_cluster.view(h, w, o, 2).numpy(),
        "global_proxy": global_proxy.view(h, w, o, 1).numpy(),
        "local_fg": local_fg.numpy(), "local_proxy": local_proxy.numpy(),
        "head": head.numpy(), "maps": maps.numpy(),
        "logits": logits.numpy(),
    }


# ---------------------------------------------------------------------------
# training path (VERDICT r4 next #4)
# ---------------------------------------------------------------------------

def reference_hard_mining_ce(logits, gts, step, top_k_percent=0.15,
                             hard_mining_step=50_000):
    """EXACT reference ``Concat_CrossEntropyLoss`` semantics
    (``networks/layers/loss.py:52-97``): per-pixel CE with
    ``ignore_index=255`` and ``reduction='none'``, then ``torch.topk``
    over the flattened pixels with k annealed 100%→``top_k_percent``
    over ``hard_mining_step`` steps, loss = mean of the k selected
    entries.

    Documented divergence vs ``rvos_tpu.engine.loss.hard_mining_ce``:
    ignored (255) pixels contribute 0-loss entries to the reference's
    top-k pool, so whenever k exceeds the number of non-ignored pixels
    the reference mean is diluted by zeros while the rebuild averages
    over the actually-selected valid pixels only.  The two agree exactly
    whenever k <= #valid pixels (always true once the anneal leaves the
    first few hundred steps, and always true when no 255s exist).

    logits: [O, H, W] torch; gts: [H, W] long. Returns scalar tensor.
    """
    o, h, w = logits.shape
    num_pixels = float(h * w)
    pred = logits.reshape(1, o, h * w)
    gt = gts.reshape(1, h * w)
    pixel_losses = F.cross_entropy(pred, gt, ignore_index=255,
                                   reduction="none")              # [1, HW]
    if hard_mining_step == 0:
        top_k_pixels = int(top_k_percent * num_pixels)
    else:
        ratio = min(1.0, step / float(hard_mining_step))
        top_k_pixels = int((ratio * top_k_percent + (1.0 - ratio))
                           * num_pixels)
    top_k_loss, _ = torch.topk(pixel_losses, k=top_k_pixels, dim=1)
    return torch.mean(top_k_loss)


def _nearest_idx(out_size, in_size):
    """torch-'nearest' source indices: src = floor(dst * in/out)."""
    return np.minimum((np.arange(out_size) * (in_size / out_size))
                      .astype(np.int64), in_size - 1)


def _downscale_label_t(lab, hw):
    """Nearest-downscale a [H, W] torch/numpy label map to ``hw``
    (mirrors ``rvos_tpu.ops.resize.resize_hw(mode='nearest')``)."""
    h, w = hw
    iy = _nearest_idx(h, lab.shape[0])
    ix = _nearest_idx(w, lab.shape[1])
    return lab[iy][:, ix]


def _segment_frame_t(sd, cfg, o, cur_emb, cur_low, ref_flat, ref_lab_flat,
                     prev_emb, prev_lab_small, obj_valid_t, memory,
                     uniforms):
    """One training-frame matching + decode in torch — the oracle twin of
    ``AOCNet.segment_frame(train=True)`` (``networks/aoc/aocnet.py:
    140-367``): single-slot reference bank (the ref frame), train atrous
    rates, k-means on DETACHED bank embeddings (``matching.py:289``).
    Differentiable end-to-end; returns (logits [O,h,w], new_memory)."""
    c, h, w = cur_emb.shape
    bias = torch.cat([_t(sd["bg_bias"]), _t(sd["fg_bias"]).expand(o - 1)])

    prev_onehot = F.one_hot(prev_lab_small.long(), o).float() \
        * obj_valid_t[None, None, :]                              # [h,w,O]
    q = cur_emb.permute(1, 2, 0).reshape(h * w, c)
    p_flat = prev_emb.permute(1, 2, 0).reshape(h * w, c)
    p_lab_flat = prev_onehot.reshape(h * w, o)

    global_fg = global_matching(q, ref_flat, ref_lab_flat, bias)
    global_cluster = cluster_matching(
        q, ref_flat.detach(), ref_lab_flat.detach(), bias, _t(uniforms),
        cfg.MODEL_CLUSTER_NUM, cfg.MODEL_KMEANS_ITERS)

    head, ref_pos, prev_pos = attention_heads(
        ref_flat, ref_lab_flat, p_flat, p_lab_flat, cfg.MODEL_EPSILON)
    global_proxy = proxy_matching(q, ref_pos, bias)
    prev_inst = (p_lab_flat @ prev_pos).reshape(h, w, c)

    radii = tuple(cfg.MODEL_MULTI_LOCAL_DISTANCE)
    cur_hwc = cur_emb.permute(1, 2, 0)
    local_fg = local_matching(cur_hwc, prev_emb.permute(1, 2, 0),
                              prev_onehot, bias, radii,
                              cfg.MODEL_LOCAL_DOWNSAMPLE,
                              cfg.TRAIN_LOCAL_ATROUS_RATE)
    local_proxy = local_matching(cur_hwc, prev_inst, prev_onehot, bias,
                                 radii, cfg.MODEL_LOCAL_DOWNSAMPLE,
                                 cfg.TRAIN_LOCAL_ATROUS_RATE)

    parts = [global_fg.view(h, w, o, 1), global_cluster.view(h, w, o, 2),
             global_proxy.view(h, w, o, 1), local_fg, local_proxy,
             prev_onehot[..., None]]
    if cfg.MODEL_MATCHING_BACKGROUND:
        parts.append(foreground2background(local_fg))
        parts.append(foreground2background(global_fg.view(h, w, o, 1)))
    maps = torch.cat(parts, dim=-1).permute(2, 3, 0, 1)           # [O,n,h,w]

    pre = _conv(sd, "dynamic_prehead.conv", maps)
    pre = F.relu(_gn(sd, "dynamic_prehead.bn", pre,
                     cfg.MODEL_PRE_HEAD_EMBEDDING_DIM // 4))
    x = torch.cat([cur_emb[None].expand(o, -1, -1, -1), pre], dim=1)

    logits, new_memory = calibration_decoding(
        sd, x, head, cur_low, cfg.MODEL_BETA_PERCENTAGE,
        cfg.MODEL_REFINE_CHANNELS, memory)
    logits = torch.where(obj_valid_t[:, None, None] > 0, logits,
                         torch.full_like(logits, -1e9))
    return logits, new_memory


def torch_train_loss(sd, batch, cfg, o, step, kmeans_uniforms):
    """Training-rollout oracle of ``make_train_step``'s ``loss_fn``
    (reference ``Trainer.sequential_training``,
    ``networks/engine/train_manager_mm.py:182-317``): T-frame rollout,
    burn-in previous-mask substitution after
    ``TRAIN_START_SEQ_TRAINING_STEPS`` (``:253-263``), per-frame
    hard-mining CE at input resolution (``:264-284``), rollout-mean
    loss.  Fully differentiable via torch autograd (``sd`` values may be
    ``requires_grad`` tensors).

    batch: numpy dict (batch size 1) — ref_img/prev_img [1,H,W,3]
    normalized float, ref_label/prev_label [1,H,W], curr_img
    [T,1,H,W,3], curr_label [T,1,H,W], obj_num [1].
    kmeans_uniforms: [T, O, R] shared PRNG draws (R = ref-bank rows).
    Returns (loss, [per-frame losses]).
    """
    t_len = batch["curr_img"].shape[0]
    imgs = np.concatenate([batch["ref_img"], batch["prev_img"],
                           batch["curr_img"][:, 0]], axis=0)
    imgs_nchw = _t(imgs).permute(0, 3, 1, 2)
    emb, low = extract_feature(sd, imgs_nchw, cfg.MODEL_GN_GROUPS,
                               cfg.MODEL_GN_EMB_GROUPS)
    ref_emb, prev_emb = emb[0], emb[1]
    c, h, w = ref_emb.shape
    full_hw = batch["ref_img"].shape[1:3]

    obj_valid = (np.arange(o) <= int(batch["obj_num"][0])).astype(np.float32)
    obj_valid_t = _t(obj_valid)

    # single-slot reference bank: the ref frame at TRAIN_GLOBAL_ATROUS_RATE
    g = cfg.TRAIN_GLOBAL_ATROUS_RATE
    ref_lab_small = _downscale_label_t(batch["ref_label"][0], (h, w))
    ref_onehot = F.one_hot(_t(np.asarray(ref_lab_small)).long(), o).float() \
        * obj_valid_t[None, None, :]
    ref_g = ref_emb.permute(1, 2, 0)[::g, ::g]
    ref_lab_g = ref_onehot[::g, ::g]
    ref_flat = ref_g.reshape(-1, c)
    ref_lab_flat = ref_lab_g.reshape(-1, o)

    prev_l_gt = _t(np.asarray(
        _downscale_label_t(batch["prev_label"][0], (h, w)))).long()
    prev_l_pred = prev_l_gt
    prev_e = prev_emb
    memory = (None, None)
    use_pred = step > cfg.TRAIN_START_SEQ_TRAINING_STEPS

    losses = []
    for t in range(t_len):
        cur_emb, cur_low = emb[2 + t], low[2 + t][None]
        if cfg.TRAIN_SEQ_GRADIENT == "detach":
            prev_e = prev_e.detach()
        prev_l = prev_l_pred if use_pred else prev_l_gt

        logits, memory = _segment_frame_t(
            sd, cfg, o, cur_emb, cur_low, ref_flat, ref_lab_flat,
            prev_e, prev_l, obj_valid_t, memory, kmeans_uniforms[t])

        logits_full = F.interpolate(logits[None], size=tuple(full_hw),
                                    mode="bilinear",
                                    align_corners=True)[0]       # [O,H,W]
        gts = _t(batch["curr_label"][t, 0].astype(np.int64)).long()
        losses.append(reference_hard_mining_ce(
            logits_full, gts, step, cfg.TRAIN_TOP_K_PERCENT_PIXELS,
            cfg.TRAIN_HARD_MINING_STEP))

        pred_full = logits_full.argmax(dim=0)                    # [H, W]
        iy = _nearest_idx(h, full_hw[0])
        ix = _nearest_idx(w, full_hw[1])
        prev_l_pred = pred_full[iy][:, ix].detach()
        prev_l_gt = _t(np.asarray(_downscale_label_t(
            batch["curr_label"][t, 0], (h, w)))).long()
        prev_e = cur_emb

    loss = torch.stack(losses).mean()
    return loss, losses
