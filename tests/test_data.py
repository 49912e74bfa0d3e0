

def test_nmt_dataset_curriculum_and_batch_shuffle():
    """-curriculum / -extra_shuffle twins (fork train.py:245-258): corpus
    order holds for the first N epochs; afterwards extra_shuffle permutes
    batch-sized BLOCKS (length-homogeneous batches preserved)."""
    import numpy as np

    from unpaired_image_captioning_tpu.data.nmt_dataset import NMTDataset

    n, bs = 12, 3
    src = np.tile(np.arange(1, n + 1)[:, None], (1, 4)).astype(np.int32)
    tgt = src.copy()
    ds = NMTDataset(src, tgt, bs, curriculum=1, batch_shuffle=True, seed=3)

    # epoch 0 (curriculum): sequential
    first_epoch = [ds.next_batch()[0]["src"][:, 0].tolist()
                   for _ in range(n // bs)]
    assert first_epoch == [[1, 2, 3], [4, 5, 6], [7, 8, 9], [10, 11, 12]]

    # epoch 1+: blocks permuted, membership intact
    second = [ds.next_batch()[0]["src"][:, 0].tolist()
              for _ in range(n // bs)]
    blocks = {tuple(b) for b in second}
    assert blocks == {(1, 2, 3), (4, 5, 6), (7, 8, 9), (10, 11, 12)}
    assert second != first_epoch  # actually permuted at seed 3
