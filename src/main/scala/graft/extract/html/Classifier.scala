package graft.extract.html

/** Boilerpipe-style shallow-text block classifier.
  *
  * Implements the published NumWords/LinkDensity decision rules from
  * Kohlschütter, Fankhauser, Nejdl — "Boilerplate Detection using Shallow
  * Text Features" (WSDM 2010), i.e. the densitometric classifier the
  * north_star names ("Boilerpipe-style text-density + link-density block
  * classifier"). Operates on the flat block sequence with prev/curr/next
  * context.
  *
  * One engine-specific addition: if the tree marks nothing as content
  * (short single-block documents), fall back to the longest low-link-density
  * block, so extraction is total on non-empty pages.
  */
object Classifier {

  private val Empty = TextBlock("", 0, 0)

  /** Decision tree from the Boilerpipe paper (NumWordsRulesClassifier). */
  def isContent(prev: TextBlock, curr: TextBlock, next: TextBlock): Boolean = {
    if (curr.linkDensity > 0.333333) false
    else if (prev.linkDensity <= 0.555556) {
      if (curr.numWords <= 16) {
        if (next.numWords <= 15) prev.numWords > 4
        else true
      } else true
    } else {
      if (curr.numWords <= 40) next.numWords > 17
      else true
    }
  }

  /** Classify each block; returns the indices flagged as content. */
  def contentIndices(blocks: IndexedSeq[TextBlock]): IndexedSeq[Int] = {
    val n = blocks.length
    val picked = (0 until n).filter { i =>
      val prev = if (i > 0) blocks(i - 1) else Empty
      val next = if (i + 1 < n) blocks(i + 1) else Empty
      isContent(prev, blocks(i), next)
    }
    if (picked.nonEmpty) picked
    else {
      // Fallback: longest block with acceptable link density.
      val cands = (0 until n).filter(i => blocks(i).numWords > 0 && blocks(i).linkDensity <= 0.333333)
      if (cands.isEmpty) IndexedSeq.empty
      else IndexedSeq(cands.maxBy(i => (blocks(i).numWords, -i)))
    }
  }

  /** Final text assembly: content blocks joined by '\n'. */
  def extractText(blocks: IndexedSeq[TextBlock]): String =
    contentIndices(blocks).map(blocks(_).text).mkString("\n")
}
