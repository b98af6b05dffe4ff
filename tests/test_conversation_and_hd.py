"""Chat runtime + HD transform tests."""

import jax
import jax.numpy as jnp
import numpy as np

from infinite_video_tpu.data import hd_utils
from infinite_video_tpu.models.decoder import Decoder, tiny_decoder_config
from infinite_video_tpu.runtime import conversation as conv_mod


class ToyTokenizer:
    eos_token_id = 2

    def __call__(self, text, add_special_tokens=False):
        ids = [3 + (abs(hash(w)) % 100) for w in text.split()]
        return {"input_ids": ([1] if add_special_tokens else []) + ids}

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(f"w{i}" for i in ids if i > 2)


def test_conversation_prompt_assembly():
    conv = conv_mod.default_conversation.copy()
    conv.append_message("Human", "<Video><ImageHere></Video> describe")
    conv.append_message("Assistant", None)
    prompt = conv.get_prompt()
    assert prompt == "###Human: <Video><ImageHere></Video> describe###Assistant:"


def test_chat_end_to_end_tiny():
    cfg = tiny_decoder_config()
    decoder = Decoder(cfg)
    params = decoder.init(jax.random.PRNGKey(0),
                          input_ids=jnp.zeros((1, 4), jnp.int32))["params"]
    tok = ToyTokenizer()

    def encode_video(chunks, rng):
        return jnp.ones((1, 4, cfg.hidden_size)) * 0.1

    chat = conv_mod.Chat(encode_video, decoder, params, tok)
    conv = conv_mod.default_conversation.copy()
    img_list = []
    chat.upload_video(jnp.zeros((2, 1, 4, 8, 8, 3)), conv, img_list)
    assert len(img_list) == 1
    chat.ask("what happens?", conv)
    # question merged into the video message (reference ask() behaviour)
    assert conv.messages[-1][0] == "Human"
    assert "what happens?" in conv.messages[-1][1]
    out = chat.answer(conv, img_list, max_new_tokens=4, do_sample=False)
    assert isinstance(out, str)
    assert conv.messages[-1][0] == "Assistant"
    assert conv.messages[-1][1] == out


def test_hd_padding_transform_shapes():
    frames = np.full((2, 100, 300, 3), 128, np.uint8)
    out = hd_utils.hd_transform_padding(frames, image_size=224, hd_num=6)
    assert out.shape[1] % 224 == 0
    assert out.shape[2] % 224 == 0


def test_hd_no_padding_aspect_snap():
    frames = np.zeros((1, 100, 210, 3), np.uint8)
    out = hd_utils.hd_transform_no_padding(frames, image_size=224, hd_num=6)
    assert out.shape[1] % 224 == 0 and out.shape[2] % 224 == 0
    # 2.1:1 aspect should snap to (2, 1) tiles
    assert out.shape[2] // 224 == 2 and out.shape[1] // 224 == 1


def test_tile_frames_with_global_view():
    frames = np.arange(2 * 448 * 224 * 3, dtype=np.uint8).reshape(2, 448, 224, 3)
    tiles = hd_utils.tile_frames(frames, 224, add_global=True)
    assert tiles.shape == (2 * (2 + 1), 224, 224, 3)
    np.testing.assert_array_equal(tiles[0], frames[0, :224])
