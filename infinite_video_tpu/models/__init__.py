"""Model registry: reference arch names → config factories / model classes.

Mirrors the LAVIS registry pattern (`registry.register_model("infvideollama")`,
infinityqa.py:26) so config files can name architectures.
"""

from infinite_video_tpu.utils.registry import registry


def _register():
    from infinite_video_tpu.models import infinite_videollama as ivl
    from infinite_video_tpu.models import videochat2 as vc2
    from infinite_video_tpu.models.videochat2_qformer import VideoChat2QFormerPretrain

    @registry.register_model("infvideollama")
    class _InfVideoLLaMA:
        config = staticmethod(ivl.default_config)
        encoder = ivl.InfVideoLLaMAEncoder

    @registry.register_model("videochat2_mistral")
    class _VideoChat2Mistral:
        config = staticmethod(vc2.default_config)
        encoder = vc2.VideoChat2Encoder

    @registry.register_model("videochat2_vicuna")
    class _VideoChat2Vicuna:
        config = staticmethod(vc2.vicuna_config)
        encoder = vc2.VideoChat2Encoder

    @registry.register_model("videochat2_phi")
    class _VideoChat2Phi:
        config = staticmethod(vc2.phi_config)
        encoder = vc2.VideoChat2Encoder

    @registry.register_model("videochat2_qformer")
    class _VideoChat2QFormer:
        encoder = VideoChat2QFormerPretrain


_registered = False
if not _registered:
    _register()
    _registered = True
