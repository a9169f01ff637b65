"""Mesh/sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


class TestMesh:
    def test_create_mesh(self):
        from ocrfa_tpu.parallel.mesh import create_mesh

        mesh = create_mesh()
        assert mesh.shape["data"] == len(jax.devices())

    def test_shard_batch_divisible(self):
        from ocrfa_tpu.parallel.mesh import create_mesh, shard_batch

        mesh = create_mesh()
        x = np.zeros((16, 4), dtype=np.float32)
        xs = shard_batch(x, mesh)
        assert not xs.sharding.is_fully_replicated

    def test_shard_batch_indivisible_pads_and_shards(self):
        from ocrfa_tpu.parallel.mesh import create_mesh, shard_batch

        mesh = create_mesh()
        x = np.arange(12, dtype=np.float32).reshape(3, 4)
        xs = shard_batch(x, mesh)
        assert not xs.sharding.is_fully_replicated
        assert xs.shape[0] == 8  # padded to the device-count multiple
        np.testing.assert_array_equal(np.asarray(xs)[:3], x)
        # pad rows replicate the final row
        np.testing.assert_array_equal(np.asarray(xs)[3:], np.repeat(x[-1:], 5, 0))

    def test_sharded_predict_indivisible_batch(self):
        """Batch sizes off the device-count multiple still shard + match."""
        from ocrfa_tpu.decode import CTCLabelConverter
        from ocrfa_tpu.decode.device import keep_mask_for
        from ocrfa_tpu.models.crnn import init_crnn_gen1
        from ocrfa_tpu.parallel.mesh import create_mesh
        from ocrfa_tpu.pipeline import Recognizer

        conv = CTCLabelConverter("ابتث")
        params = init_crnn_gen1(jax.random.PRNGKey(1), num_class=conv.num_classes,
                                output_channel=64, hidden_size=64)
        keep = keep_mask_for(conv.num_classes, conv.ignore_idx)
        rng = np.random.default_rng(1)
        batch = rng.integers(0, 255, (3, 64, 64, 1)).astype(np.uint8)

        single = Recognizer(params, conv).predict(batch, keep)
        sharded = Recognizer(params, conv, mesh=create_mesh()).predict(batch, keep)
        assert len(sharded) == 3
        assert [r[0] for r in single] == [r[0] for r in sharded]


class TestShardedRecognition:
    def test_sharded_predict_matches_single(self):
        from ocrfa_tpu.decode import CTCLabelConverter
        from ocrfa_tpu.decode.device import keep_mask_for
        from ocrfa_tpu.models.crnn import init_crnn_gen1
        from ocrfa_tpu.parallel.mesh import create_mesh
        from ocrfa_tpu.pipeline import Recognizer

        conv = CTCLabelConverter("ابتث")
        params = init_crnn_gen1(jax.random.PRNGKey(0), num_class=conv.num_classes,
                                output_channel=64, hidden_size=64)
        keep = keep_mask_for(conv.num_classes, conv.ignore_idx)
        rng = np.random.default_rng(0)
        batch = rng.integers(0, 255, (16, 64, 64, 1)).astype(np.uint8)

        single = Recognizer(params, conv).predict(batch, keep)
        sharded = Recognizer(params, conv, mesh=create_mesh()).predict(batch, keep)
        assert [r[0] for r in single] == [r[0] for r in sharded]
        np.testing.assert_allclose(
            [r[1] for r in single], [r[1] for r in sharded], rtol=1e-5
        )

    @pytest.mark.slow
    def test_sharded_train_step(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ocrfa_tpu.models.crnn import init_crnn_gen1
        from ocrfa_tpu.parallel.mesh import create_mesh
        from ocrfa_tpu.train import make_optimizer, make_train_step

        mesh = create_mesh()
        params = init_crnn_gen1(jax.random.PRNGKey(0), num_class=12,
                                output_channel=64, hidden_size=64)
        opt = make_optimizer()
        state = opt.init(params)
        step = make_train_step(opt)

        rng = np.random.default_rng(0)
        n = 16
        images = rng.standard_normal((n, 64, 64, 1)).astype(np.float32)
        labels = rng.integers(1, 12, (n, 6)).astype(np.int32)
        lengths = np.full((n,), 6, dtype=np.int32)

        repl = NamedSharding(mesh, P())
        dp = NamedSharding(mesh, P("data"))
        p = jax.device_put(params, repl)
        s = jax.device_put(state, repl)
        _, _, loss_sharded = step(
            p, s, jax.device_put(images, dp), jax.device_put(labels, dp),
            jax.device_put(lengths, dp),
        )
        _, _, loss_single = step(params, state, images, labels, lengths)
        assert np.isclose(float(loss_sharded), float(loss_single), rtol=1e-5)
