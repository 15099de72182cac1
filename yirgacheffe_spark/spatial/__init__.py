from . import cells
from . import s2
from . import joins
from . import lineage
