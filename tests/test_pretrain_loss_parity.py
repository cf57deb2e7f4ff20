"""Golden parity of the FULL four-objective pretrain loss vs a torch oracle
mirroring reference SPMM_models.py:79-256 line by line (eval mode, fixed
property masks and hard negatives, fixed queues, momentum update skipped —
EMA weights used as-is on both sides)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spmm_tpu.configs import BertArchConfig, PretrainConfig
from spmm_tpu.checkpoint.convert import load_torch_state_dict
from spmm_tpu.training.pretrain import pretrain_loss, pretrain_state_from_reference

from conftest import requires_reference
from test_spmm_convert import TEXT_CFG, PROP_CFG, build_reference_style_ckpt

EMBED_DIM = 16


def torch_oracle(torch, ref, state, prop, ids, mask, mpm_mask,
                 neg_prop_idx, neg_text_idx, q_prop, q_text, alpha):
    """Reference SPMM.forward re-expressed over raw xbert modules + tensors
    (mirrors SPMM_models.py:79-256; eval mode => no dropout)."""
    import torch.nn.functional as F

    def cfg(n_layers, vocab, cross):
        return ref.BertConfig(
            vocab_size=vocab, hidden_size=32, num_hidden_layers=n_layers,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=64, type_vocab_size=2, fusion_layer=2,
            encoder_width=32, add_cross_attention=cross, hidden_act="gelu",
            layer_norm_eps=1e-12, pad_token_id=0, hidden_dropout_prob=0.1,
            attention_probs_dropout_prob=0.1, autoregressive=0)

    def load(prefix, model):
        sub = {k[len(prefix):]: v for k, v in state.items()
               if k.startswith(prefix)}
        model.load_state_dict(sub, strict=True)
        return model.eval()

    text_encoder = load("text_encoder.", ref.BertForMaskedLM(cfg(4, 300, True)))
    prop_encoder = load("property_encoder.",
                        ref.BertForMaskedLM(cfg(2, 1, False)).bert)
    text_encoder_m = load("text_encoder_m.",
                          ref.BertForMaskedLM(cfg(4, 300, True)))
    prop_encoder_m = load("property_encoder_m.",
                          ref.BertForMaskedLM(cfg(2, 1, False)).bert)

    def lin(name, x):
        return x @ state[f"{name}.weight"].T + state[f"{name}.bias"]

    temp = state["temp"]
    bs = prop.size(0)

    with torch.no_grad():
        # property masking with FIXED mpm_mask (SPMM_models.py:82-88)
        prop_feature = lin("property_embed", prop.unsqueeze(2))
        unk = state["property_unk"].expand(bs, prop.size(1), -1)
        mexp = mpm_mask.unsqueeze(2).repeat(1, 1, unk.size(2))
        masked = prop_feature * (1 - mexp) + unk * mexp
        properties = torch.cat(
            [state["property_cls"].expand(bs, -1, -1), masked], dim=1)

        prop_embeds = prop_encoder(inputs_embeds=properties,
                                   return_dict=True).last_hidden_state
        prop_atts = torch.ones(prop_embeds.size()[:-1], dtype=torch.long)
        prop_feat = F.normalize(lin("property_proj", prop_embeds[:, 0]), dim=-1)
        text_embeds = text_encoder.bert(
            ids, attention_mask=mask, return_dict=True,
            mode="text").last_hidden_state
        text_feat = F.normalize(lin("text_proj", text_embeds[:, 0]), dim=-1)

        prop_embeds_m = prop_encoder_m(inputs_embeds=properties,
                                       return_dict=True).last_hidden_state
        prop_feat_m = F.normalize(lin("property_proj_m", prop_embeds_m[:, 0]),
                                  dim=-1)
        text_embeds_m = text_encoder_m.bert(
            ids, attention_mask=mask, return_dict=True,
            mode="text").last_hidden_state
        text_feat_m = F.normalize(lin("text_proj_m", text_embeds_m[:, 0]),
                                  dim=-1)

        prop_feat_all = torch.cat([prop_feat_m.t(), q_prop], dim=1)
        text_feat_all = torch.cat([text_feat_m.t(), q_text], dim=1)

        sims_m = [prop_feat_m @ text_feat_all / temp,
                  text_feat_m @ prop_feat_all / temp,
                  prop_feat_m @ prop_feat_all / temp,
                  text_feat_m @ text_feat_all / temp]
        sim_targets = torch.zeros(sims_m[0].size())
        sim_targets.fill_diagonal_(1)
        targets = [alpha * F.softmax(s, dim=1) + (1 - alpha) * sim_targets
                   for s in sims_m]

        sims = [prop_feat @ text_feat_all / temp,
                text_feat @ prop_feat_all / temp,
                prop_feat @ prop_feat_all / temp,
                text_feat @ text_feat_all / temp]
        loss_ita = sum(
            -torch.sum(F.log_softmax(s, dim=1) * t, dim=1).mean()
            for s, t in zip(sims, targets)) / 2

        # ITM with FIXED negatives (SPMM_models.py:135-206)
        pos_pos_prop = text_encoder.bert(
            encoder_embeds=prop_embeds, attention_mask=prop_atts,
            encoder_hidden_states=text_embeds, encoder_attention_mask=mask,
            return_dict=True, mode="fusion").last_hidden_state[:, 0]
        pos_pos_text = text_encoder.bert(
            encoder_embeds=text_embeds, attention_mask=mask,
            encoder_hidden_states=prop_embeds, encoder_attention_mask=prop_atts,
            return_dict=True, mode="fusion").last_hidden_state[:, 0]
        pos_pos = torch.cat([pos_pos_prop, pos_pos_text], dim=-1)

        prop_embeds_neg = prop_embeds[neg_prop_idx]
        text_embeds_neg = text_embeds[neg_text_idx]
        text_atts_neg = mask[neg_text_idx]
        text_embeds_all = torch.cat([text_embeds, text_embeds_neg])
        text_atts_all = torch.cat([mask, text_atts_neg])
        prop_embeds_all = torch.cat([prop_embeds_neg, prop_embeds])
        prop_atts_all = torch.cat([prop_atts, prop_atts])
        pos_neg_prop = text_encoder.bert(
            encoder_embeds=prop_embeds_all, attention_mask=prop_atts_all,
            encoder_hidden_states=text_embeds_all,
            encoder_attention_mask=text_atts_all,
            return_dict=True, mode="fusion").last_hidden_state[:, 0]
        pos_neg_text = text_encoder.bert(
            encoder_embeds=text_embeds_all, attention_mask=text_atts_all,
            encoder_hidden_states=prop_embeds_all,
            encoder_attention_mask=prop_atts_all,
            return_dict=True, mode="fusion").last_hidden_state[:, 0]
        pos_neg = torch.cat([pos_neg_prop, pos_neg_text], dim=-1)
        vl = torch.cat([pos_pos, pos_neg], dim=0)
        vl_out = lin("itm_head", vl)
        itm_labels = torch.cat([torch.ones(bs, dtype=torch.long),
                                torch.zeros(2 * bs, dtype=torch.long)])
        loss_itm = F.cross_entropy(vl_out, itm_labels)

        # MLM + distillation (SPMM_models.py:210-238)
        labels = ids.clone()[:, 1:]
        logits_m = text_encoder_m(
            ids, attention_mask=mask, encoder_hidden_states=prop_embeds_m,
            encoder_attention_mask=prop_atts, return_dict=True,
            is_decoder=True, return_logits=True)[:, :-1, :]
        mlm_out = text_encoder(
            ids, attention_mask=mask, encoder_hidden_states=prop_embeds,
            encoder_attention_mask=prop_atts, return_dict=True,
            is_decoder=True, return_logits=True)[:, :-1, :]
        loss_mlm = F.cross_entropy(mlm_out.permute(0, 2, 1), labels,
                                   ignore_index=-100)
        distill = -torch.sum(
            F.log_softmax(mlm_out, dim=-1) * F.softmax(logits_m, dim=-1),
            dim=-1)
        loss_distill = distill[labels != 0].mean()
        loss_mlm = (1 - alpha) * loss_mlm + alpha * loss_distill

        # MPM (SPMM_models.py:240-256)
        prop_causal = prop_encoder(inputs_embeds=properties, is_decoder=True,
                                   return_dict=True).last_hidden_state
        prop_out = text_encoder.bert(
            encoder_embeds=prop_causal, attention_mask=prop_atts,
            encoder_hidden_states=text_embeds, encoder_attention_mask=mask,
            return_dict=True, is_decoder=True,
            mode="fusion").last_hidden_state[:, :-1, :]
        h = prop_out
        h = lin("property_mtr_head.0", h)
        h = F.gelu(h)
        h = F.layer_norm(h, (h.size(-1),),
                         state["property_mtr_head.2.weight"],
                         state["property_mtr_head.2.bias"], eps=1e-12)
        pred = lin("property_mtr_head.3", h).squeeze(-1)
        keep = (1 - mpm_mask).bool()
        loss_mpm = F.mse_loss(pred[keep], prop[keep])

    return (float(loss_mlm), float(loss_mpm) * 5, float(loss_ita),
            float(loss_itm))


@requires_reference
def test_full_pretrain_loss_parity(tmp_path):
    import torch
    from reference_shim import import_reference_xbert

    ref = import_reference_xbert()
    path = str(tmp_path / "ckpt.ckpt")
    raw = build_reference_style_ckpt(torch, path)

    g = torch.Generator().manual_seed(5)
    bs, L = 4, 10
    prop = torch.randn(bs, 53, generator=g)
    ids = torch.randint(4, 300, (bs, L), generator=g)
    ids[:, 0] = 2
    mask = torch.ones(bs, L, dtype=torch.long)
    mask[2, 7:] = 0
    ids = ids * mask
    mpm_mask = (torch.rand(bs, 53, generator=g) < 0.5).float()
    neg_prop_idx = torch.tensor([1, 2, 3, 0])
    neg_text_idx = torch.tensor([2, 3, 0, 1])
    q_prop = torch.randn(EMBED_DIM, 64, generator=g)
    q_prop = q_prop / q_prop.norm(dim=0, keepdim=True)
    q_text = torch.randn(EMBED_DIM, 64, generator=g)
    q_text = q_text / q_text.norm(dim=0, keepdim=True)
    alpha = 0.4

    want = torch_oracle(torch, ref, raw, prop, ids, mask, mpm_mask,
                        neg_prop_idx, neg_text_idx, q_prop, q_text, alpha)

    pcfg = PretrainConfig(embed_dim=EMBED_DIM, queue_size=64)
    state_dict = load_torch_state_dict(path)
    st = pretrain_state_from_reference(state_dict, pcfg, TEXT_CFG, PROP_CFG)
    queue = {"prop": jnp.asarray(q_prop.numpy()),
             "text": jnp.asarray(q_text.numpy()),
             "ptr": jnp.zeros((), jnp.int32)}
    batch = {"prop": jnp.asarray(prop.numpy()),
             "ids": jnp.asarray(ids.numpy()),
             "mask": jnp.asarray(mask.numpy())}
    total, aux = pretrain_loss(
        st["params"], st["ema"], queue, batch, jax.random.PRNGKey(0),
        jnp.float32(alpha), TEXT_CFG, PROP_CFG, pcfg, deterministic=True,
        noise_override={
            "mpm_mask": jnp.asarray(mpm_mask.numpy()),
            "neg_prop_idx": jnp.asarray(neg_prop_idx.numpy()),
            "neg_text_idx": jnp.asarray(neg_text_idx.numpy()),
        })

    got = (float(aux["loss_mlm"]), float(aux["loss_mpm"]),
           float(aux["loss_ita"]), float(aux["loss_itm"]))
    for name, g_, w_ in zip(("mlm", "mpm", "ita", "itm"), got, want):
        np.testing.assert_allclose(g_, w_, atol=2e-4, rtol=1e-4,
                                   err_msg=f"loss_{name}")
