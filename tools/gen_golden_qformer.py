"""Generate golden fixtures for the Q-former by driving the reference model.

Imports the reference Qformer.py (+ LTM) from /root/reference via importlib
(with small compat shims for transformers>=4.40 moves), runs multi-chunk
forwards on seeded inputs in eval mode, and saves the filtered state_dict,
inputs and per-chunk outputs for the JAX parity tests.

Usage: python tools/gen_golden_qformer.py
"""

import importlib.util
import os
import sys
import tempfile
import types

import numpy as np
import torch

REF = "/root/reference/infty-Video-LLaMA/InfVideoLLaMA/models"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def load_reference_qformer():
    import transformers.modeling_utils as mu
    import transformers.pytorch_utils as pu

    for n in ("apply_chunking_to_forward", "find_pruneable_heads_and_indices",
              "prune_linear_layer"):
        if not hasattr(mu, n):
            setattr(mu, n, getattr(pu, n))
    try:
        import transformers.file_utils  # noqa: F401
    except ImportError:
        fu = types.ModuleType("transformers.file_utils")
        from transformers.utils import ModelOutput
        fu.ModelOutput = ModelOutput
        sys.modules["transformers.file_utils"] = fu

    for name in ("InfVideoLLaMA", "InfVideoLLaMA.models", "InfVideoLLaMA.common"):
        m = types.ModuleType(name)
        m.__path__ = []
        sys.modules.setdefault(name, m)
    for name in ("basis_functions", "long_term_attention_gibbs", "Qformer"):
        spec = importlib.util.spec_from_file_location(
            f"InfVideoLLaMA.models.{name}", os.path.join(REF, f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"InfVideoLLaMA.models.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["InfVideoLLaMA.models.Qformer"]


def build(Q, *, num_layers, freq, encoder_width, num_basis, alpha, sticky,
          tau=0.75, query_len=32):
    from transformers.models.bert.configuration_bert import BertConfig

    cfg = BertConfig()  # bert-base defaults (768/12/3072/30522)
    cfg.num_hidden_layers = num_layers
    cfg.encoder_width = encoder_width
    cfg.add_cross_attention = True
    cfg.cross_attention_freq = freq
    cfg.query_length = query_len
    cfg.sticky = sticky
    cfg.num_basis = num_basis
    cfg.sigmas = [0.005, 0.01]
    cfg.tau = tau
    cfg.alpha = alpha
    model = Q.BertLMHeadModel(config=cfg)
    model.eval()
    return model


def run_case(Q, *, tag, num_layers, freq, chunk_len, num_basis, alpha,
             with_text, num_chunks=2, seed=0):
    torch.manual_seed(seed)
    model = build(Q, num_layers=num_layers, freq=freq, encoder_width=768,
                  num_basis=num_basis, alpha=alpha, sticky=False)

    query = torch.randn(1, 32, 768) * 0.5
    chunks = [torch.randn(1, chunk_len * 32, 768) * 0.5 for _ in range(num_chunks)]
    pos_ext = torch.ones(1, chunk_len * 32, 768)  # pure LTM gate (Qformer.py:216)
    input_ids = None
    attn_mask = None
    if with_text:
        input_ids = torch.randint(0, 30522, (1, 12))
        attn_mask = torch.ones(1, 32 + 12)

    outs = []
    cwd = os.getcwd()
    with tempfile.TemporaryDirectory() as td:
        os.chdir(td)  # the LTM forward pickles a density dump to ./
        try:
            with torch.no_grad():
                for i, ch in enumerate(chunks):
                    out = model.bert(
                        input_ids=input_ids,
                        position_embedding_ext=pos_ext if alpha != 1.0 else None,
                        attention_mask=attn_mask,
                        query_embeds=query,
                        encoder_hidden_states=ch,
                        encoder_attention_mask=torch.ones(1, ch.shape[1]),
                        new_video=(i == 0),
                        return_dict=True,
                    )
                    outs.append(out.last_hidden_state.numpy().copy())
        finally:
            os.chdir(cwd)

    sd = {k: v.numpy() for k, v in model.state_dict().items()
          if "long_term_attention" not in k}
    fixture = {
        "num_layers": num_layers, "freq": freq, "chunk_len": chunk_len,
        "num_basis": num_basis, "alpha": alpha, "with_text": int(with_text),
        "num_chunks": num_chunks, "query": query.numpy(),
    }
    if with_text:
        fixture["input_ids"] = input_ids.numpy()
    for i in range(num_chunks):
        fixture[f"chunk{i}"] = chunks[i].numpy()
        fixture[f"out{i}"] = outs[i]
    np.savez_compressed(os.path.join(OUT, f"qformer_{tag}.npz"), **fixture)
    np.savez_compressed(os.path.join(OUT, f"qformer_{tag}_sd.npz"), **sd)
    print(f"wrote qformer_{tag}: layers={num_layers} freq={freq} L={chunk_len} "
          f"N={num_basis} alpha={alpha} text={with_text}")


def run_cap_case(Q, *, tag, seed=0):
    """Stage-1 caption-LM fixture: the reference pipeline is a vision pass
    with use_cache=True followed by a causal text decode over the returned
    past_key_values with label_smoothing=0.1 (videochat2_qformer.py:343-371,
    Qformer.py:1047-1140). The rebuild's single joint causal_text pass must
    reproduce the loss and text logits exactly (queries never attend to
    text, so their K/V equal the vision-only pass's)."""
    torch.manual_seed(seed)
    model = build(Q, num_layers=2, freq=2, encoder_width=96, num_basis=64,
                  alpha=1.0, sticky=False, query_len=8)

    query = torch.randn(1, 8, 768) * 0.5
    enc = torch.randn(1, 40, 96) * 0.5
    cap_ids = torch.randint(3, 30000, (1, 10))
    cap_ids[0, 0] = 101                       # BOS slot
    labels = cap_ids.clone()
    labels[0, 7:] = -100                      # padded tail ignored
    attn = torch.cat([torch.ones(1, 8), torch.ones(1, 10)], dim=1)

    with torch.no_grad():
        vis = model.bert(query_embeds=query, encoder_hidden_states=enc,
                         encoder_attention_mask=torch.ones(1, enc.shape[1]),
                         use_cache=True, return_dict=True)
        out = model(input_ids=cap_ids, attention_mask=attn,
                    past_key_values=vis.past_key_values, labels=labels,
                    return_dict=True, is_decoder=True)
    sd = {k: v.numpy() for k, v in model.state_dict().items()
          if "long_term_attention" not in k}
    np.savez_compressed(
        os.path.join(OUT, f"qformer_{tag}.npz"),
        query=query.numpy(), enc=enc.numpy(), cap_ids=cap_ids.numpy(),
        labels=labels.numpy(), loss=out.loss.numpy(),
        logits=out.logits.numpy())
    np.savez_compressed(os.path.join(OUT, f"qformer_{tag}_sd.npz"), **sd)
    print(f"wrote qformer_{tag}: caption-LM loss={float(out.loss):.6f}")


def main():
    os.makedirs(OUT, exist_ok=True)
    Q = load_reference_qformer()
    # Video Q-former shape (LLaMA side): 2 layers, freq=1, LTM blended.
    run_case(Q, tag="video2l", num_layers=2, freq=1, chunk_len=16,
             num_basis=64, alpha=0.5, with_text=False, seed=10)
    # LTM disabled via alpha=1.0 (pure discrete, reference gate Qformer.py:220).
    run_case(Q, tag="alpha1", num_layers=2, freq=1, chunk_len=16,
             num_basis=64, alpha=1.0, with_text=False, seed=11)
    # VC2 shape: 4 layers, freq=2, text input alongside queries.
    run_case(Q, tag="vc2text", num_layers=4, freq=2, chunk_len=8,
             num_basis=64, alpha=0.5, with_text=True, seed=12)
    # Stage-1 caption LM: past-KV causal decode == our joint causal pass.
    run_cap_case(Q, tag="caplm", seed=13)


if __name__ == "__main__":
    main()
