package graft

/** Engine-level lifecycle surface. Five operator families pin
  * intermediates (owned `persist()`s released via each owner's
  * `releaseIntermediates()`); a long-lived session running several
  * families previously had to know to call every owner — this is the
  * single release point. Owners self-register here at class-load via
  * [[register]], so adding a pin registry to a new operator family is
  * one line and [[releaseAll]] stays complete.
  */
object Engine {

  private val owners =
    scala.collection.mutable.ListBuffer.empty[(String, () => Unit)]

  /** Register a pin-registry release hook (idempotent per name). */
  def register(name: String)(release: () => Unit): Unit = synchronized {
    if (!owners.exists(_._1 == name)) owners += (name -> release)
  }

  /** Names of the registered pin owners (forces owner class-load). */
  def ownerNames: Seq[String] = {
    builtin() // OUTSIDE the monitor — see releaseAll
    synchronized { owners.map(_._1).toSeq }
  }

  /** Release every operator family's pinned intermediates. Returned
    * frames stay valid — re-evaluation recomputes from source (each
    * owner's own contract). Call at session idle points or teardown.
    *
    * `builtin()` runs OUTSIDE the monitor: it forces owner CLASS
    * INITIALIZATION, and each owner's initializer calls [[register]]
    * (which takes this monitor) — holding the monitor across a class
    * init whose initializer needs the same monitor deadlocks against
    * a concurrent first touch of the owner class. Owners are
    * snapshotted under the monitor, released outside it.
    */
  def releaseAll(): Unit = {
    builtin()
    val snapshot = synchronized { owners.toList }
    snapshot.foreach { case (_, release) => release() }
  }

  // self-registration happens in each owner's object initializer; an
  // owner whose class never loaded has nothing pinned, but releaseAll
  // must not DEPEND on prior use — force-load the built-in owners
  private def builtin(): Unit = {
    // a release on an empty registry is a no-op, but the CALL forces
    // the owner object's initializer (and so its register()) to run
    operators.Dedup.releaseIntermediates()
    operators.Similarity.releaseIntermediates()
    operators.Collocations.releaseIntermediates()
    operators.GraphRank.releaseIntermediates()
    operators.Bpe.releaseIntermediates()
  }
}
