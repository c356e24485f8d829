from d3feat_tpu.train.losses import (cdist, circle_loss, contrastive_loss,  # noqa: F401
                                     d3feat_loss, det_loss)
