package graft.sources.ssh

/** SFTP version 3 message and status codes
  * (draft-ietf-secsh-filexfer-02 — the dialect every OpenSSH speaks)
  * plus the ATTRS codec both ends share.
  */
object SftpProto {
  val Version = 3L

  val Init = 1; val VersionMsg = 2
  val Open = 3; val Close = 4; val Read = 5; val Write = 6
  val Lstat = 7; val Fstat = 8; val Setstat = 9; val Fsetstat = 10
  val Opendir = 11; val Readdir = 12; val Remove = 13
  val Mkdir = 14; val Rmdir = 15; val Realpath = 16; val Stat = 17
  val Rename = 18
  val Status = 101; val Handle = 102; val Data = 103
  val Name = 104; val AttrsMsg = 105

  // pflags (OPEN)
  val PflagRead = 0x1L; val PflagWrite = 0x2L; val PflagAppend = 0x4L
  val PflagCreat = 0x8L; val PflagTrunc = 0x10L; val PflagExcl = 0x20L

  // status codes
  val StOk = 0L; val StEof = 1L; val StNoSuchFile = 2L
  val StPermissionDenied = 3L; val StFailure = 4L; val StBadMessage = 5L
  val StOpUnsupported = 8L

  // ATTRS flags
  val AttrSize = 0x1L; val AttrUidGid = 0x2L
  val AttrPermissions = 0x4L; val AttrAcModTime = 0x8L

  case class Attrs(size: Option[Long] = None, perms: Option[Long] = None,
      mtimeSec: Option[Long] = None) {
    def isDir: Boolean = perms.exists(p => (p & 0xF000L) == 0x4000L)
  }

  def writeAttrs(w: SshWriter, a: Attrs): SshWriter = {
    var flags = 0L
    if (a.size.isDefined) flags |= AttrSize
    if (a.perms.isDefined) flags |= AttrPermissions
    if (a.mtimeSec.isDefined) flags |= AttrAcModTime
    w.u32(flags)
    a.size.foreach(w.u64)
    a.perms.foreach(w.u32)
    a.mtimeSec.foreach { t => w.u32(t); w.u32(t) } // atime, mtime
    w
  }

  def readAttrs(r: SshReader): Attrs = {
    val flags = r.u32()
    val size = if ((flags & AttrSize) != 0) Some(r.u64()) else None
    if ((flags & AttrUidGid) != 0) { r.u32(); r.u32() }
    val perms =
      if ((flags & AttrPermissions) != 0) Some(r.u32()) else None
    val mtime =
      if ((flags & AttrAcModTime) != 0) { r.u32(); Some(r.u32()) } else None
    Attrs(size, perms, mtime)
  }
}
