from d3feat_tpu.models.kpfcnn import KPFCNN, init_kpfcnn  # noqa: F401
