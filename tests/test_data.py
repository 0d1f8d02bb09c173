import numpy as np
import pytest
from PIL import Image

from vector_quantization_tpu.data import (
    ConcatDataset,
    DataLoader,
    ImageFolderDataset,
    SplitDataset,
    SyntheticDataset,
    pixel_decode,
    pixel_encode,
)


def test_pixel_codec_roundtrip():
    img = np.random.default_rng(0).integers(0, 256, (8, 8, 3), dtype=np.uint8)
    enc = pixel_encode(img)
    assert enc.min() >= -1 and enc.max() <= 1
    np.testing.assert_array_equal(pixel_decode(enc), img)


def test_synthetic_dataset_deterministic():
    ds = SyntheticDataset(size=16, image_size=32)
    a, b = ds[3], ds[3]
    np.testing.assert_array_equal(a.original_image, b.original_image)
    assert a.image.shape == (32, 32, 3)
    assert a.category == 3 % 10


def test_folder_dataset(tmp_path):
    for cls in ("cat", "dog"):
        (tmp_path / cls).mkdir()
        for i in range(3):
            Image.new("RGB", (40, 30), (i * 40, 100, 200)).save(
                tmp_path / cls / f"{i}.png"
            )
    ds = ImageFolderDataset(
        root=str(tmp_path), categorical=True, name="t", image_size=16
    )
    assert len(ds) == 6
    assert ds.num_categories == 2
    item = ds[0]
    assert item.original_image.shape == (16, 16, 3)
    assert item.category in (0, 1)


def test_split_dataset_partitions():
    base = SyntheticDataset(size=100, image_size=8, name="base")
    tr = SplitDataset(dataset=base, split="train", val_size=20)
    va = SplitDataset(dataset=base, split="val", val_size=20)
    assert len(tr) == 80 and len(va) == 20
    ids = {it.id_ for it in tr} | {it.id_ for it in va}
    assert len(ids) == 100  # disjoint, complete


def test_concat_dataset():
    a = SyntheticDataset(size=5, image_size=8, name="a")
    b = SyntheticDataset(size=7, image_size=8, name="b")
    ds = ConcatDataset(datasets=[a, b])
    assert len(ds) == 12
    assert ds[6].id_ == b[1].id_


class TestDataLoader:
    def test_batch_shapes(self):
        ds = SyntheticDataset(size=20, image_size=16)
        dl = DataLoader(ds, batch_size=4, num_workers=2)
        batches = list(dl)
        assert len(batches) == 5
        assert batches[0].image.shape == (4, 16, 16, 3)
        assert batches[0].category.dtype == np.int32

    def test_global_batch_sharding(self):
        ds = SyntheticDataset(size=32, image_size=8)
        shards = [
            list(
                DataLoader(
                    ds,
                    batch_size_in_total=8,
                    num_processes=4,
                    process_index=r,
                    num_workers=0,
                )
            )
            for r in range(4)
        ]
        # each process sees 2 rows/batch; union across processes = full batch
        assert all(len(s) == 4 for s in shards)
        assert shards[0][0].image.shape[0] == 2
        ids = [id_ for s in shards for b in s for id_ in b.id_]
        assert len(set(ids)) == 32

    def test_shuffle_changes_across_epochs(self):
        ds = SyntheticDataset(size=16, image_size=8)
        dl = DataLoader(ds, batch_size=4, shuffle=True, num_workers=0)
        e1 = [id_ for b in dl for id_ in b.id_]
        e2 = [id_ for b in dl for id_ in b.id_]
        assert set(e1) == set(e2)
        assert e1 != e2

    def test_drop_last_false_pads(self):
        ds = SyntheticDataset(size=10, image_size=8)
        dl = DataLoader(ds, batch_size=4, drop_last=False, num_workers=0)
        batches = list(dl)
        assert len(batches) == 3
        assert all(b.image.shape[0] == 4 for b in batches)

    def test_pipeline_auto_calibrates_once(self):
        # pipeline="auto" (default) times inline vs producer-thread on
        # the first batches, picks empirically, and must neither drop,
        # reorder nor duplicate data (VERDICT r4 #6)
        ds = SyntheticDataset(size=40, image_size=8)
        dl = DataLoader(ds, batch_size=4, num_workers=2)
        e1 = [id_ for b in dl for id_ in b.id_]
        assert dl._pipeline_choice in ("thread", "inline")
        choice = dl._pipeline_choice
        e2 = [id_ for b in dl for id_ in b.id_]  # sticky across epochs
        assert e1 == e2
        assert dl._pipeline_choice == choice
        assert len(e1) == 40

    def test_pipeline_forced_modes_match(self):
        ds = SyntheticDataset(size=24, image_size=8)
        ref = [
            id_
            for b in DataLoader(ds, batch_size=4, num_workers=0)
            for id_ in b.id_
        ]
        for mode in ("thread", "inline"):
            got = [
                id_
                for b in DataLoader(
                    ds, batch_size=4, num_workers=2, pipeline=mode
                )
                for id_ in b.id_
            ]
            assert got == ref


class TestTransforms:
    """All four reference augmentation presets
    (configs/datasets/transforms/{none,default,weak,strong}.py)."""

    @pytest.mark.parametrize(
        "augmentation", ["none", "default", "weak", "strong"]
    )
    def test_output_shape_and_dtype(self, augmentation):
        from vector_quantization_tpu.data.base import Transform

        t = Transform(32, augmentation, seed=0)
        img = Image.fromarray(
            np.random.default_rng(0).integers(
                0, 255, (50, 70, 3), dtype=np.uint8
            )
        )
        out = t(img)
        assert out.shape == (32, 32, 3) and out.dtype == np.uint8

    def test_none_is_deterministic(self):
        from vector_quantization_tpu.data.base import Transform

        img = Image.fromarray(
            np.random.default_rng(1).integers(
                0, 255, (50, 70, 3), dtype=np.uint8
            )
        )
        a = Transform(32, "none", seed=0)(img)
        b = Transform(32, "none", seed=7)(img)
        np.testing.assert_array_equal(a, b)

    def test_strong_crops_larger_area_than_default(self):
        # strong's crop-scale floor is 0.8 vs default's 0.08. On an image
        # that is white only in the center quarter, a >=80%-area crop always
        # retains most of the white mass, while default's tiny crops often
        # land almost entirely inside or outside it — so the per-draw mean
        # brightness varies far more under 'default'.
        from vector_quantization_tpu.data.base import Transform

        arr = np.zeros((64, 64, 3), np.uint8)
        arr[16:48, 16:48] = 255
        img = Image.fromarray(arr)

        def mean_spread(aug):
            means = [
                Transform(32, aug, seed=s)(img).mean() for s in range(40)
            ]
            return np.std(means)

        assert mean_spread("default") > 2.0 * mean_spread("strong")

    def test_unknown_augmentation_raises(self):
        from vector_quantization_tpu.data.base import Transform

        with pytest.raises(ValueError):
            Transform(32, "nope")(Image.new("RGB", (40, 40)))
