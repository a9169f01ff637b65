"""Serving pipeline: full-page stream through device-resident staging."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def pipeline():
    import jax

    from ocrfa_tpu.decode import CTCLabelConverter
    from ocrfa_tpu.models.craft import init_craft
    from ocrfa_tpu.models.crnn import init_crnn_gen1
    from ocrfa_tpu.pipeline import Recognizer
    from ocrfa_tpu.serving import ServingPipeline

    conv = CTCLabelConverter("ابتثج")
    rec = Recognizer(
        init_crnn_gen1(jax.random.PRNGKey(0), num_class=conv.num_classes,
                       output_channel=64, hidden_size=64),
        conv,
    )
    det = init_craft(jax.random.PRNGKey(1))
    return ServingPipeline(det, rec, canvas_size=128)


def synthetic_page(seed, h=96, w=128):
    rng = np.random.default_rng(seed)
    page = np.full((h, w), 235, dtype=np.uint8)
    page[20:40, 10:110] = rng.integers(0, 90, (20, 100))
    page[60:80, 30:100] = rng.integers(0, 90, (20, 70))
    return page


class TestServingPipeline:
    def test_stream(self, pipeline):
        pages = [synthetic_page(i) for i in range(3)]
        results = list(pipeline.process(pages, depth=2))
        assert len(results) == 3
        for page_result in results:
            for quad, text, conf in page_result:
                assert len(quad) == 4
                assert isinstance(text, str)

    def test_empty_page(self, pipeline):
        # uniform page: detector output below thresholds -> no boxes
        page = np.full((96, 128), 255, dtype=np.uint8)
        result = pipeline.finish_page(pipeline.submit_page(page))
        assert isinstance(result, list)


class TestServingMesh:
    def test_sharded_page_batch(self):
        import jax

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")

        from ocrfa_tpu.decode import CTCLabelConverter
        from ocrfa_tpu.models.craft import init_craft
        from ocrfa_tpu.models.crnn import init_crnn_gen1
        from ocrfa_tpu.parallel.mesh import create_mesh
        from ocrfa_tpu.pipeline import Recognizer
        from ocrfa_tpu.serving import ServingPipeline

        mesh = create_mesh()
        conv = CTCLabelConverter("ابت")
        rec = Recognizer(
            init_crnn_gen1(jax.random.PRNGKey(0), num_class=conv.num_classes,
                           output_channel=64, hidden_size=64),
            conv, mesh=mesh,
        )
        pipe = ServingPipeline(init_craft(jax.random.PRNGKey(1)), rec,
                               canvas_size=128, mesh=mesh)
        pages = [synthetic_page(i) for i in range(8)]
        handles = pipe.submit_page_batch(pages)
        assert len(handles) == 8
        results = [pipe.finish_page(h) for h in handles]
        assert len(results) == 8
