package graft

/** Extension query inventory beyond q21–q24: dedup (MinHash/SimHash/Jaccard/
  * embedding), ANN, text analysis, multimodal plumbing, windows, rollup,
  * streaming. Populated incrementally; every entry keeps the same oracle
  * conventions as Queries. */
object ExtQueries {
  def all: Seq[Queries.QDef] = Seq()
}
