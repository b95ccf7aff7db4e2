"""Host-agreement / joined-loader semantics (single-process behavior; the
multi-process path is the standard jax allgather and shares this code)."""

from cosy_tpu.utils.distributed import all_hosts_agree, joined_loader


def test_single_host_agreement_is_identity():
    assert all_hosts_agree(True) is True
    assert all_hosts_agree(False) is False


def test_joined_loader_passes_through_and_stops():
    batches = [{"x": i} for i in range(4)]
    out = list(joined_loader(iter(batches)))
    assert out == batches


def test_joined_loader_stops_at_exhaustion_without_error():
    def gen():
        yield 1
        yield 2

    assert list(joined_loader(gen())) == [1, 2]
    assert list(joined_loader(iter([]))) == []
