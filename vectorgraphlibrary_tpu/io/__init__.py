from . import edges_container, generation
