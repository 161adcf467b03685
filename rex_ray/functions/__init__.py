"""Pure-function kernel library (no Ray dependency).

Each kernel re-derives the semantics of a reference utility (cited per
function) so it can be unit-tested against the reference's own golden
vectors and then used inside vectorized ``map_batches`` bodies.
"""

from rex_ray.functions.tagging import (  # noqa: F401
    get_entities_from_tags,
    count_illegal_tags,
)
from rex_ray.functions.span import (  # noqa: F401
    find_closest_span_pairs,
    find_closest_span_pairs_with_index,
)
from rex_ray.functions.position import (  # noqa: F401
    find_all_positions,
    construct_relative_positions,
    find_element_in_list,
    extract_spans_from_start_end,
    decode_pointer_matrix_spans,
)
from rex_ray.functions.mask import construct_piecewise_mask  # noqa: F401
from rex_ray.functions.metrics import (  # noqa: F401
    safe_division,
    prf1_from_counts,
    measure_triples,
)
from rex_ray.functions.padding import pad_or_truncate  # noqa: F401
from rex_ray.functions.segmentation import (  # noqa: F401
    sent_seg,
    split_list_by_element,
)
