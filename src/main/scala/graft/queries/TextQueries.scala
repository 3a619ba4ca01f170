package graft.queries

import graft.Q

/** Text analysis over `documents`: language-ID, quality scoring, token
  * counting, fingerprinting. */
object TextQueries {
  val all: Seq[Q] = Seq()
}
