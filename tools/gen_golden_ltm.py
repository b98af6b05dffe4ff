"""Generate golden fixtures for the LTM core by driving the reference code.

Loads the reference's `basis_functions.py` + `long_term_attention_gibbs.py`
from /root/reference (read-only, via importlib — nothing is copied into this
repo) on torch-CPU, runs multi-chunk consolidation + continuous attention on
seeded random inputs, and saves inputs/outputs as .npz fixtures under
tests/golden/. The JAX implementation is then tested against these numbers.

Sticky-memory runs record the Categorical bin draws (torch RNG) so the JAX
test can replay the identical positions — sampling parity is distribution-
level, but everything downstream of the draw is checked exactly.

Usage: python tools/gen_golden_ltm.py
"""

import os
import sys
import tempfile
import types
import importlib.util

import numpy as np
import torch

REF = "/root/reference/infty-Video-LLaMA/InfVideoLLaMA/models"
REF_VC2 = "/root/reference/infty-VideoChat2/models/blip2"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def _load_pair(ref_dir, pkg_name):
    pkg = types.ModuleType(pkg_name)
    pkg.__path__ = [ref_dir]
    sys.modules[pkg_name] = pkg
    for name in ("basis_functions", "long_term_attention_gibbs"):
        spec = importlib.util.spec_from_file_location(
            f"{pkg_name}.{name}", os.path.join(ref_dir, f"{name}.py")
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"{pkg_name}.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules[f"{pkg_name}.long_term_attention_gibbs"]


def load_reference_ltm():
    """Import the reference module pair as a synthetic package."""
    return _load_pair(REF, "_refmodels")


def load_reference_ltm_vc2():
    """The VideoChat2 copy — differs only in pooling geometry
    (196 patches x 1024 features, 96 query tokens)."""
    return _load_pair(REF_VC2, "_refmodels_vc2")


def make_ltm(mod, num_basis, tau, sticky, proj_key, proj_value):
    return mod.LongTermAttention(
        head_size=64, length=768, target_len=768, attn_func="softmax",
        attn_num_basis=num_basis, continuous=True, attn_drop=0.1,
        infinite_memory=True, n_layers=2, n_heads=12, affines=True,
        mask=True, mask_type="cnn", kl_regularizer=False,
        proj_key=proj_key, proj_value=proj_value, sigma_0=None, mu_0=None,
        sticky_memories=sticky, sigmas=[0.005, 0.01], tau=tau,
    )


def run_case(mod, *, num_basis, chunk_len, tau, sticky, num_chunks, seed, tag):
    torch.manual_seed(seed)
    proj_key = torch.nn.Linear(768, 768)
    proj_value = torch.nn.Linear(768, 768)
    ltm = make_ltm(mod, num_basis, tau, sticky, proj_key, proj_value)

    chunks = [torch.randn(1, chunk_len * 32, 768) * 0.5 for _ in range(num_chunks)]
    q = torch.randn(1, 32, 768) * 0.5

    drawn_bins = []
    if sticky:
        # Record the Categorical draws so JAX can replay identical positions.
        real_cat = torch.distributions.Categorical

        class RecordingCategorical(real_cat):
            def sample(self, shape=torch.Size()):
                s = super().sample(shape)
                if self.probs.dim() == 2:  # the 127-bin batch draw
                    drawn_bins.append(s.numpy().copy())
                return s

        mod.dist.Categorical = RecordingCategorical

    contexts, bs, masses = [], [], []
    cwd = os.getcwd()
    with tempfile.TemporaryDirectory() as td:
        os.chdir(td)  # the reference forward pickles a density dump to ./
        try:
            with torch.no_grad():
                for i, k in enumerate(chunks):
                    ctx = ltm(k, q, new_doc=(i == 0), layer_n=0)
                    contexts.append(ctx.numpy().copy())
                    bs.append(ltm.B_past.numpy().copy())
        finally:
            os.chdir(cwd)
    if sticky:
        mod.dist.Categorical = torch.distributions.Categorical

    out = {
        "num_basis": num_basis, "chunk_len": chunk_len, "tau": tau,
        "sticky": int(sticky), "num_chunks": num_chunks,
        "q": q.numpy(),
        "wk": proj_key.weight.detach().numpy(), "bk": proj_key.bias.detach().numpy(),
        "wv": proj_value.weight.detach().numpy(), "bv": proj_value.bias.detach().numpy(),
    }
    for i in range(num_chunks):
        out[f"k{i}"] = chunks[i].numpy()
        out[f"ctx{i}"] = contexts[i]
        out[f"B{i}"] = bs[i]
    for i, b in enumerate(drawn_bins):
        out[f"bins{i}"] = b  # [S, 1] draws used before chunk i+1
    path = os.path.join(OUT, f"ltm_{tag}.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path}: {num_chunks} chunks, N={num_basis}, L={chunk_len}, "
          f"tau={tau}, sticky={sticky}")


def run_case_vc2(mod, *, num_basis, chunk_len, tau, num_chunks, seed, tag):
    """VC2 pooling variant: k=[1, L*196, 1024], q=[1, 96, 768], proj 1024->768
    (infty-VideoChat2/models/blip2/long_term_attention_gibbs.py:291,304)."""
    torch.manual_seed(seed)
    proj_key = torch.nn.Linear(1024, 768)
    proj_value = torch.nn.Linear(1024, 768)
    ltm = make_ltm(mod, num_basis, tau, False, proj_key, proj_value)

    chunks = [torch.randn(1, chunk_len * 196, 1024) * 0.5
              for _ in range(num_chunks)]
    q = torch.randn(1, 96, 768) * 0.5

    contexts, bs = [], []
    with torch.no_grad():
        for i, k in enumerate(chunks):
            ctx = ltm(k, q, new_doc=(i == 0), layer_n=0)
            contexts.append(ctx.numpy().copy())
            bs.append(ltm.B_past.numpy().copy())

    out = {
        "q": q.numpy(),
        "wk": proj_key.weight.detach().numpy(), "bk": proj_key.bias.detach().numpy(),
        "wv": proj_value.weight.detach().numpy(), "bv": proj_value.bias.detach().numpy(),
    }
    for i in range(num_chunks):
        out[f"k{i}"] = chunks[i].numpy()
        out[f"ctx{i}"] = contexts[i]
        out[f"B{i}"] = bs[i]
    path = os.path.join(OUT, f"ltm_{tag}.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path}: {num_chunks} chunks, N={num_basis}, L={chunk_len} (vc2)")


def gen_gmatrix_fixtures(mod):
    """Golden G / G_inf / resample matrices straight from the reference."""
    for num_basis, chunk_len, tau in [(64, 16, 0.75), (256, 8, 0.75),
                                      (256, 256, 0.75), (64, 16, 0.9)]:
        proj = torch.nn.Linear(768, 768)
        ltm = make_ltm(mod, num_basis, tau, False, proj, proj)
        ltm.device = "cpu"
        ltm.length = chunk_len
        ltm.get_basis(chunk_len, chunk_len)
        np.savez_compressed(
            os.path.join(OUT, f"gmat_n{num_basis}_l{chunk_len}_t{tau}.npz"),
            G=ltm.Gs[chunk_len].numpy(),
            G_inf=ltm.G_inf.numpy(),
            samples=ltm.samples.numpy(),
        )
        print(f"wrote gmat_n{num_basis}_l{chunk_len}_t{tau}.npz "
              f"G={ltm.Gs[chunk_len].shape} G_inf={ltm.G_inf.shape}")


def main():
    os.makedirs(OUT, exist_ok=True)
    torch.set_default_dtype(torch.float32)
    mod = load_reference_ltm()
    gen_gmatrix_fixtures(mod)
    # Uniform (non-sticky) full path, 3 chunks — covers first-fit + 2 refits.
    run_case(mod, num_basis=64, chunk_len=16, tau=0.75, sticky=False,
             num_chunks=3, seed=0, tag="uniform_n64_l16")
    run_case(mod, num_basis=256, chunk_len=8, tau=0.75, sticky=False,
             num_chunks=3, seed=1, tag="uniform_n256_l8")
    # Sticky path with recorded draws, 3 chunks.
    run_case(mod, num_basis=64, chunk_len=16, tau=0.75, sticky=True,
             num_chunks=3, seed=2, tag="sticky_n64_l16")
    # NExT-QA recipe geometry (README.md:39: max_int=256, num_basis=256).
    run_case(mod, num_basis=256, chunk_len=256, tau=0.75, sticky=True,
             num_chunks=2, seed=5, tag="sticky_n256_l256")
    # VC2 pooling variant (196x1024 patches, 96 query tokens).
    run_case_vc2(load_reference_ltm_vc2(), num_basis=64, chunk_len=4,
                 tau=0.75, num_chunks=2, seed=7, tag="vc2_n64_l4")


if __name__ == "__main__":
    main()
