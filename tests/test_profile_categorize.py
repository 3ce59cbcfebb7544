"""Unit tests for the xplane profiler's HLO categorizer.

The categorizer must bucket by the op's own opcode/LHS, never by operand
text — a fusion consuming a Pallas output has "%custom-call" in its operand
list and was misattributed before the round-3 fix (~20 ms/step moved
buckets on the 47.2 ms CIFAR trace).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from profile_step import categorize  # noqa: E402


def test_pallas_custom_call():
    line = (
        "%down1_attn0.3 = bf16[128,3,4,256,64]{4,3,2,1,0:T(8,128)(2,1)S(1)} "
        "custom-call(bf16[128,3,4,256,64]{4,3,2,1,0:T(8,128)(2,1)} %fusion.7)"
    )
    assert categorize(line) == "custom/pallas"


def test_fusion_consuming_custom_call_is_not_pallas():
    line = (
        "%fusion.68 = bf16[128,32,32,384]{3,0,2,1:T(8,128)(2,1)} "
        "fusion(f32[128,32,32,384]{3,0,2,1:T(8,128)} %custom-call.12)"
    )
    assert categorize(line) == "fusion(elementwise)"


def test_conv_wgrad_by_tupled_kernel_output():
    line = (
        "%fusion.1483 = (f32[]{:T(128)}, bf16[3,3,384,128]{3,2,1,0:T(8,128)(2,1)}) "
        "fusion(bf16[128,32,32,128]{3,0,2,1:T(8,128)(2,1)} %get-tuple-element.9)"
    )
    assert categorize(line) == "conv wgrad fusion"


def test_conv_wgrad_by_plain_kernel_output():
    line = "%fusion.9 = bf16[3,3,256,256]{3,2,1,0} fusion(bf16[128,16,16,256]{} %x)"
    assert categorize(line) == "conv wgrad fusion"


def test_conv_dgrad_by_kernel_operand():
    line = (
        "%fusion.298 = bf16[32,128,32,256]{3,1,0,2:T(8,128)(2,1)} "
        "fusion(bf16[3,3,256,256]{3,2,1,0:T(8,128)(2,1)S(1)} %copy-done.2)"
    )
    assert categorize(line) == "conv fwd/dgrad fusion"


def test_named_conv_fusion():
    line = (
        "%convolution_add_fusion.5 = bf16[128,32,32,256]{} "
        "fusion(bf16[3,3,256,256]{} %custom-call.1)"
    )
    assert categorize(line) == "convolution"


def test_rng_bit_generator():
    line = "%rng-bit-generator.3 = (u32[2]{0}, u32[128,32,32,4]{3,2,1,0}) rng-bit-generator(u32[2]{0} %x)"
    assert categorize(line) == "rng"


def test_copy_and_transpose():
    assert categorize("%copy.4 = bf16[128,256]{1,0} copy(bf16[128,256]{0,1} %a)") == "copy/transpose"
    assert categorize("%transpose.1 = f32[4,2]{1,0} transpose(f32[2,4]{1,0} %b)") == "copy/transpose"


def test_convert_reduce_fusion_without_kernel_operand():
    line = (
        "%convert_reduce_fusion.8 = (f32[128,128]{1,0:T(8,128)}, bf16[128,32,32,128]{}) "
        "fusion(bf16[128,128]{1,0:T(8,128)} %y)"
    )
    assert categorize(line) == "convert_reduce_fusion"


def test_collectives_bucketed_before_reduce():
    """"%all-reduce.5" has "reduce" in its LHS; it must land in the
    collective bucket, not "reduce" (ADVICE r3)."""
    ar = "%all-reduce.5 = f32[256,256]{1,0} all-reduce(f32[256,256]{1,0} %x)"
    assert categorize(ar) == "collective"
    rs = "%reduce-scatter.2 = f32[32,256]{1,0} reduce-scatter(f32[256,256]{1,0} %x)"
    assert categorize(rs) == "collective"
    ag = "%all-gather.1 = f32[256,256]{1,0} all-gather(f32[32,256]{1,0} %x)"
    assert categorize(ag) == "collective"
    cp = "%collective-permute.3 = f32[8,8]{1,0} collective-permute(f32[8,8]{1,0} %x)"
    assert categorize(cp) == "collective"


def test_send_recv_bucketed_host_io():
    send = "%send.1 = (f32[8]{0}, u32[], token[]) send(f32[8]{0} %x, token[] %t)"
    assert categorize(send) == "host-io"
    recv = "%recv-done.2 = (f32[8]{0}, token[]) recv-done((f32[8]{0}, u32[], token[]) %r)"
    assert categorize(recv) == "host-io"


def test_plain_reduce_still_reduce():
    line = "%reduce.9 = f32[128]{0} reduce(f32[128,256]{1,0} %x, f32[] %zero)"
    assert categorize(line) == "reduce"


def test_one_by_one_conv_kernels_bucketed():
    """The UNet's 1x1 skip-projection convs must land in the conv buckets."""
    wgrad = "%fusion.7 = (f32[]{:T(128)}, bf16[1,1,128,256]{3,2,1,0}) fusion(bf16[128,32,32,128]{} %x)"
    assert categorize(wgrad) == "conv wgrad fusion"
    dgrad = "%fusion.8 = bf16[128,32,32,128]{} fusion(bf16[1,1,128,256]{3,2,1,0} %w)"
    assert categorize(dgrad) == "conv fwd/dgrad fusion"
