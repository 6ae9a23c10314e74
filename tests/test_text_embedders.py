"""Parity for the text/class conditioning encoders (dead in the shipped
reference configs, surface kept for checkpoint compatibility): the reference's
lucidrains-fork ``TransformerWrapper`` (ldm/modules/x_transformer.py:548-640)
and ``ClassEmbedder`` (ldm/modules/encoders/modules.py:19-31), random-init on
CPU, exported through `stedm_tpu.utils.torch_import.map_xtransformer` and
compared forward-for-forward against `stedm_tpu/models/text_embedders.py`."""

import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REFERENCE.exists(),
                                reason="reference checkout not mounted")
if REFERENCE.exists():
    sys.path.append(str(REFERENCE))

VOCAB, SEQ, DIM, DEPTH = 100, 16, 32, 2


def _ref_wrapper(seed=0):
    torch = pytest.importorskip("torch")
    from ldm.modules.x_transformer import Encoder, TransformerWrapper

    torch.manual_seed(seed)
    m = TransformerWrapper(num_tokens=VOCAB, max_seq_len=SEQ,
                           attn_layers=Encoder(dim=DIM, depth=DEPTH))
    m.eval()
    return torch, m


def _ours_from(torch_model, *, depth=DEPTH):
    from stedm_tpu.models.text_embedders import TransformerWrapper
    from stedm_tpu.utils.torch_import import map_xtransformer

    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    params = map_xtransformer(sd, depth=depth, root="")
    ours = TransformerWrapper(num_tokens=VOCAB, max_seq_len=SEQ, dim=DIM,
                              depth=depth)
    return ours, params


def test_transformer_wrapper_embeddings_parity():
    torch, ref = _ref_wrapper()
    ours, params = _ours_from(ref)

    rng = np.random.default_rng(1)
    tokens = rng.integers(0, VOCAB, size=(3, SEQ))
    with torch.no_grad():
        want = ref(torch.from_numpy(tokens), return_embeddings=True).numpy()
    got = np.asarray(ours.apply({"params": params}, tokens))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_transformer_wrapper_masked_and_logits_parity():
    torch, ref = _ref_wrapper(seed=2)
    ours, params = _ours_from(ref)

    rng = np.random.default_rng(3)
    tokens = rng.integers(0, VOCAB, size=(2, SEQ))
    mask = np.zeros((2, SEQ), dtype=bool)
    mask[0, :11] = True  # ragged padding, like max_length-padded BERT ids
    mask[1, :5] = True
    with torch.no_grad():
        want_emb = ref(torch.from_numpy(tokens), return_embeddings=True,
                       mask=torch.from_numpy(mask)).numpy()
        want_logits = ref(torch.from_numpy(tokens), return_embeddings=False).numpy()
    got_emb = np.asarray(ours.apply({"params": params}, tokens,
                                    mask=mask))
    # masked *query* rows attend to garbage by design in the reference too —
    # compare only rows inside the mask (x_transformer.py:302-309)
    np.testing.assert_allclose(got_emb[mask], want_emb[mask],
                               atol=2e-5, rtol=2e-5)
    got_logits = np.asarray(ours.apply({"params": params}, tokens,
                                       return_embeddings=False))
    np.testing.assert_allclose(got_logits, want_logits, atol=2e-5, rtol=2e-5)


def test_bert_embedder_shapes_and_dropout_rng():
    """BERTEmbedder (modules.py:78-101): embeddings shape, and emb_dropout
    actually consults the dropout rng when non-deterministic."""
    import jax
    import jax.numpy as jnp

    from stedm_tpu.models.text_embedders import BERTEmbedder

    m = BERTEmbedder(n_embed=DIM, n_layer=1, vocab_size=50, max_seq_len=SEQ,
                     embedding_dropout=0.5)
    tokens = jnp.zeros((2, SEQ), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), tokens)["params"]
    out = m.apply({"params": params}, tokens)
    assert out.shape == (2, SEQ, DIM)
    a = m.apply({"params": params}, tokens, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(1)})
    b = m.apply({"params": params}, tokens, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(a), np.asarray(b))
    assert np.allclose(np.asarray(m.apply({"params": params}, tokens)), out)


def test_class_embedder_parity():
    torch = pytest.importorskip("torch")
    from ldm.modules.encoders.modules import ClassEmbedder as RefClassEmbedder

    import jax

    from stedm_tpu.models.text_embedders import ClassEmbedder

    torch.manual_seed(4)
    ref = RefClassEmbedder(embed_dim=24, n_classes=7)
    cls = np.array([0, 3, 6])
    with torch.no_grad():
        want = ref({"class": torch.from_numpy(cls)}).numpy()

    ours = ClassEmbedder(embed_dim=24, n_classes=7)
    params = ours.init(jax.random.PRNGKey(0), {"class": cls})["params"]
    params = {"embedding": {
        "embedding": ref.embedding.weight.detach().numpy()}}
    got = np.asarray(ours.apply({"params": params}, {"class": cls}))
    assert got.shape == want.shape == (3, 1, 24)
    np.testing.assert_allclose(got, want, atol=1e-6)
