"""Resolution algebra tests, ported from the reference's most important unit
tests (reference test/test_image_proc.py:20-91) plus analytic-output checks.
"""

from dream_tpu.utils import resolutions as res


def test_shrink_resolution():
    assert res.shrink_resolution((640, 480), (400, 400)) == (533, 400)
    assert res.shrink_resolution((640, 480), (640, 480)) == (640, 480)


def test_shrink_and_crop_resolution():
    cropped, coords = res.shrink_and_crop_resolution((640, 480), (400, 400))
    assert cropped == (480, 480)
    assert coords == (80, 0)

    cropped_same, coords_same = res.shrink_and_crop_resolution(
        (640, 480), (640, 480)
    )
    assert cropped_same == (640, 480)
    assert coords_same == (0, 0)


def test_resolution_after_preprocessing():
    inp, ref = (640, 480), (400, 400)
    assert res.resolution_after_preprocessing(inp, ref, "none") == inp
    assert res.resolution_after_preprocessing(inp, ref, "resize") == ref
    assert res.resolution_after_preprocessing(inp, ref, "shrink") == (533, 400)
    assert res.resolution_after_preprocessing(inp, ref, "shrink-and-crop") == ref


def test_vgg_output_resolution():
    # vgg-Q: 400x400 -> 100x100 (reference arch_configs/dream_vgg_q.yaml +
    # probe result in dream/network.py:304-317)
    assert res.vgg_output_resolution((400, 400)) == (100, 100)
    # vgg-F deconv decoder: full resolution
    assert res.vgg_output_resolution((400, 400), deconv_decoder=True) == (400, 400)
    # full_output upsample decoder: full resolution
    assert res.vgg_output_resolution((400, 400), full_output=True) == (400, 400)
    # non-multiple-of-16 input follows floor pooling then x4
    assert res.vgg_output_resolution((533, 400)) == (132, 100)


def test_resnet_output_resolution():
    # resnet-H: 400x400 -> 208x208 (4 doubling deconvs from 13x13)
    assert res.resnet_output_resolution((400, 400)) == (208, 208)
    # resnet-F: extra deconv -> 416x416
    assert res.resnet_output_resolution((400, 400), full=True) == (416, 416)
