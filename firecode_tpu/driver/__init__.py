from firecode_tpu.driver.embedder import Embedder, RunEmbedding

__all__ = ["Embedder", "RunEmbedding"]
