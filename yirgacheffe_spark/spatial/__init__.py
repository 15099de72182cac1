from . import cells
from . import joins
from . import lineage
