from cacophony_tpu.hear.embeddings import CacoHearEmbedder, AudioMAEHearEmbedder  # noqa: F401
