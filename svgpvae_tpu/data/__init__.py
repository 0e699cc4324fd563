from svgpvae_tpu.data.ball import (  # noqa: F401
    make_path_batch,
    make_video_batch,
    make_video_batch_fn,
    make_circles,
    make_squares,
    make_test_batches,
)
from svgpvae_tpu.data.mnist import (  # noqa: F401
    generate_rotated_mnist,
    derive_base_images_from_eval,
    synthetic_digit_base_images,
    load_keras_mnist_npz,
    load_rotated_mnist,
    generate_init_inducing_points,
    add_global_index,
    batch_iterator,
)
from svgpvae_tpu.data.sprites import (  # noqa: F401
    generate_synthetic_sprites,
    sprites_pca_init,
    load_sprites,
    sprites_batch_iterator,
    preprocess_sprites,
    load_raw_sprites_npys,
    has_raw_sprites_npys,
    save_sprites_shards,
)
